#!/usr/bin/env python
"""Convert raw argoverse data for the argoverse reader: Argoverse -> infos pickles.

Port target: /root/reference/scripts/preprocess_argoverse.py. The conversion
depends on the 'argoverse' SDK, which is not part of this image; this script
gates on it and delegates the converted-format contract to the reader
docstring (open3d_ml_tpu/datasets/argoverse.py).
"""

import sys

try:
    import argoverse  # noqa: F401
except ImportError:
    sys.exit("preprocess_argoverse.py requires the 'argoverse' package. "
             "Install it in a preprocessing environment and rerun; the "
             "training image itself only consumes the converted output "
             "(see open3d_ml_tpu/datasets/argoverse.py for the format).")

raise NotImplementedError(
    "SDK present but converter not vendored in this build; convert with the "
    "upstream tooling or extend this script following the reader contract.")
