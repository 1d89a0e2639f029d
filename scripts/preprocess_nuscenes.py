#!/usr/bin/env python
"""Convert raw nuscenes data for the nuscenes reader: NuScenes -> infos_{train,val,test}.pkl.

Port target: /root/reference/scripts/preprocess_nuscenes.py. The conversion
depends on the 'nuscenes' SDK, which is not part of this image; this script
gates on it and delegates the converted-format contract to the reader
docstring (open3d_ml_tpu/datasets/nuscenes.py).
"""

import sys

try:
    import nuscenes  # noqa: F401
except ImportError:
    sys.exit("preprocess_nuscenes.py requires the 'nuscenes' package. "
             "Install it in a preprocessing environment and rerun; the "
             "training image itself only consumes the converted output "
             "(see open3d_ml_tpu/datasets/nuscenes.py for the format).")

raise NotImplementedError(
    "SDK present but converter not vendored in this build; convert with the "
    "upstream tooling or extend this script following the reader contract.")
