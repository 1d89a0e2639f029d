#!/usr/bin/env python
"""Reduce raw Semantic3D scans for training.

Rebuild of /root/reference/scripts/preprocess_semantic3d.py: grid-subsample
the enormous raw scans (hundreds of millions of points) at 0.01 m to a
trainable size, carrying colors and labels through the barycenter reduction.
"""

import argparse
import glob
import sys
from os.path import basename, exists, join
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.ops.subsample import grid_subsampling
from open3d_ml_tpu.utils import make_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--size_limit", type=int, default=200,
                        help="chunk size in MB for reading")
    parser.add_argument("--grid_size", type=float, default=0.01)
    args = parser.parse_args()
    make_dir(args.out_path)

    for txt in sorted(glob.glob(join(args.dataset_path, "*.txt"))):
        name = basename(txt)
        label_path = txt.replace(".txt", ".labels")
        print(f"processing {name}")
        pc = np.loadtxt(txt, dtype=np.float32)
        points = np.ascontiguousarray(pc[:, 0:3])
        feat = np.ascontiguousarray(pc[:, 3:7])
        if exists(label_path):
            labels = np.loadtxt(label_path, dtype=np.int32).reshape(-1)
            sp, sf, sl = grid_subsampling(points, features=feat,
                                          labels=labels,
                                          grid_size=args.grid_size)
            np.savetxt(join(args.out_path, name.replace(".txt", ".labels")),
                       sl, fmt="%d")
        else:
            sp, sf = grid_subsampling(points, features=feat,
                                      grid_size=args.grid_size)
        out = np.concatenate(
            [sp, sf[:, 0:1], sf[:, 1:4]], axis=1)
        np.savetxt(join(args.out_path, name), out, fmt="%.3f")
        print(f"  {points.shape[0]} -> {sp.shape[0]} points")


if __name__ == "__main__":
    main()
