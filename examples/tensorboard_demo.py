#!/usr/bin/env python
"""TensorBoard 3D-summary walkthrough (counterpart of the reference
examples/tensorboard_pytorch.py).

Writes (a) scalar curves, (b) 3D point-cloud summaries with per-point
labels, and (c) 3D bounding-box summaries into ./tb_demo_logs using the
TensorBoard mesh plugin (open3d_ml_tpu.pipelines.summaries — works without
the open3d wheel). Inspect with:

    tensorboard --logdir ./tb_demo_logs
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.datasets.utils import BEVBox3D
from open3d_ml_tpu.pipelines.summaries import (add_boxes_summary,
                                               add_pointcloud_summary)
from open3d_ml_tpu.vis import LabelLUT


def main():
    from torch.utils.tensorboard import SummaryWriter
    logdir = "./tb_demo_logs"
    writer = SummaryWriter(logdir)
    rng = np.random.default_rng(0)

    # (a) scalar curves, the bread-and-butter training signal
    for step in range(20):
        writer.add_scalar("demo/loss", float(np.exp(-step / 5.0)), step)
        writer.add_scalar("demo/accuracy",
                          float(1 - np.exp(-step / 4.0)), step)

    # (b) labeled point cloud, one summary per "epoch"
    lut = LabelLUT({0: "ground", 1: "vegetation", 2: "building"})
    for step in range(3):
        pts = rng.uniform(0, 10, (8000, 3)).astype(np.float32)
        labels = np.digitize(pts[:, 2], [3.0, 6.0]).astype(np.int32)
        add_pointcloud_summary(writer, "demo/cloud", pts, labels=labels,
                               lut=lut, step=step)

    # (c) detection boxes around random cluster centers
    boxes = []
    for _ in range(5):
        c = rng.uniform(2, 8, 3)
        boxes.append(BEVBox3D(center=c, size=[1.6, 1.5, 3.9],
                              yaw=float(rng.uniform(0, np.pi)),
                              label_class="Car", confidence=1.0))
    add_boxes_summary(writer, "demo/boxes", boxes, step=0)

    writer.close()
    print(f"wrote demo summaries to {logdir}; view with "
          f"`tensorboard --logdir {logdir}`")


if __name__ == "__main__":
    main()
