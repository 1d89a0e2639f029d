#!/usr/bin/env python
"""Convert raw lyft data for the lyft reader: Lyft -> infos pickles.

Port target: /root/reference/scripts/preprocess_lyft.py. The conversion
depends on the 'lyft_dataset_sdk' SDK, which is not part of this image; this script
gates on it and delegates the converted-format contract to the reader
docstring (open3d_ml_tpu/datasets/lyft.py).
"""

import sys

try:
    import lyft_dataset_sdk  # noqa: F401
except ImportError:
    sys.exit("preprocess_lyft.py requires the 'lyft_dataset_sdk' package. "
             "Install it in a preprocessing environment and rerun; the "
             "training image itself only consumes the converted output "
             "(see open3d_ml_tpu/datasets/lyft.py for the format).")

raise NotImplementedError(
    "SDK present but converter not vendored in this build; convert with the "
    "upstream tooling or extend this script following the reader contract.")
