#!/usr/bin/env python
"""Build the ground-truth box database for ObjectSample augmentation.

Rebuild of /root/reference/scripts/collect_bboxes.py: iterates the training
split, attaches the points inside each gt box, and pickles the box list
(consumed by ObjdetAugmentation.load_gt_database).
"""

import argparse
import multiprocessing
import pickle
import sys
from os.path import join
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.datasets.utils import operations
from open3d_ml_tpu.utils import get_module


def parse_args():
    parser = argparse.ArgumentParser(
        description="Collect bounding boxes for augmentation.")
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--out_path", default=None)
    parser.add_argument("--dataset_type", default="KITTI")
    parser.add_argument("--num_cpus", type=int,
                        default=multiprocessing.cpu_count())
    parser.add_argument("--max_pc", type=int, default=None)
    return parser.parse_args()


def process_boxes(train, i):
    data = train.get_data(i)
    bbox = data["bounding_boxes"]
    flat_bbox = [box.to_xyzwhlr() for box in bbox]
    indices = operations.points_in_box(data["point"], flat_bbox)
    bboxes = []
    for j, box in enumerate(bbox):
        box.points_inside_box = data["point"][indices[:, j]]
        bboxes.append(box)
    return bboxes


def main():
    args = parse_args()
    out_path = args.out_path or args.dataset_path

    Dataset = get_module("dataset", args.dataset_type)
    dataset = Dataset(args.dataset_path)
    train = dataset.get_split("train")

    rng = np.random.default_rng()
    indices = list(range(len(train)))
    if args.max_pc is not None and args.max_pc < len(indices):
        indices = list(rng.choice(indices, args.max_pc, replace=False))

    boxes = []
    for n, i in enumerate(indices):
        boxes.extend(process_boxes(train, int(i)))
        if (n + 1) % 100 == 0:
            print(f"processed {n + 1}/{len(indices)} frames, "
                  f"{len(boxes)} boxes")

    out_file = join(out_path, "bboxes.pkl")
    with open(out_file, "wb") as f:
        pickle.dump(boxes, f)
    print(f"Saved {len(boxes)} boxes to {out_file}")


if __name__ == "__main__":
    main()
