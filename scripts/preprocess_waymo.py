#!/usr/bin/env python
"""Convert raw waymo data for the waymo reader: Waymo frames -> KITTI-format velodyne/calib/label_all.

Port target: /root/reference/scripts/preprocess_waymo.py. The conversion
depends on the 'waymo_open_dataset' SDK, which is not part of this image; this script
gates on it and delegates the converted-format contract to the reader
docstring (open3d_ml_tpu/datasets/waymo.py).
"""

import sys

try:
    import waymo_open_dataset  # noqa: F401
except ImportError:
    sys.exit("preprocess_waymo.py requires the 'waymo_open_dataset' package. "
             "Install it in a preprocessing environment and rerun; the "
             "training image itself only consumes the converted output "
             "(see open3d_ml_tpu/datasets/waymo.py for the format).")

raise NotImplementedError(
    "SDK present but converter not vendored in this build; convert with the "
    "upstream tooling or extend this script following the reader contract.")
