#!/usr/bin/env python
"""Visualizer walkthrough (counterpart of the reference examples/visualize.py):
browse a dataset split or custom clouds; exports colored PLYs headlessly.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.utils import get_module
from open3d_ml_tpu.vis import LabelLUT, Visualizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default=None,
                        help="dataset class name (e.g. SemanticKITTI)")
    parser.add_argument("--dataset_path", default=None)
    parser.add_argument("--split", default="training")
    parser.add_argument("--indices", type=int, nargs="*", default=[0])
    parser.add_argument("--out_dir", default="./vis_export")
    args = parser.parse_args()

    vis = Visualizer()
    if args.dataset:
        Dataset = get_module("dataset", args.dataset)
        dataset = Dataset(dataset_path=args.dataset_path)
        out = vis.visualize_dataset(dataset, args.split,
                                    indices=args.indices,
                                    out_dir=args.out_dir)
    else:
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 5, (20000, 3)).astype(np.float32)
        labels = (pts[:, 2] > 2.5).astype(np.int32)
        lut = LabelLUT({0: "low", 1: "high"})
        out = vis.visualize([{"name": "demo", "points": pts,
                              "labels": labels}], lut=lut,
                            out_dir=args.out_dir)
    print("exported:", out)


if __name__ == "__main__":
    main()
