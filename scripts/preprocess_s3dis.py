#!/usr/bin/env python
"""Convert raw S3DIS Annotations into the pickled room format.

Rebuild of /root/reference/scripts/preprocess_s3dis.py: per room, gather the
per-object annotation txts (x y z r g b), label points by object class, fit a
gt box per object, and pickle (points_array[N,7], boxes) into original_pkl/.
"""

import argparse
import glob
import pickle
import sys
from os.path import basename, exists, join
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.datasets.utils import BEVBox3D
from open3d_ml_tpu.datasets.utils.operations import get_min_bbox
from open3d_ml_tpu.utils import make_dir

CLASSES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter"
]
NAME2LBL = {n: i for i, n in enumerate(CLASSES)}


def process_room(room_dir):
    points_list = []
    boxes = []
    for ann in sorted(glob.glob(join(room_dir, "Annotations", "*.txt"))):
        cls_name = basename(ann).split("_")[0]
        label = NAME2LBL.get(cls_name, NAME2LBL["clutter"])
        pts = np.loadtxt(ann, dtype=np.float32)
        if pts.ndim == 1:
            pts = pts[None]
        lab = np.full((pts.shape[0], 1), label, np.float32)
        points_list.append(np.concatenate([pts, lab], axis=1))
        if cls_name not in ("ceiling", "floor", "wall", "clutter") and \
                pts.shape[0] >= 4:
            box = get_min_bbox(pts[:, :3])
            bev = BEVBox3D(center=[box[0], box[1], box[2]],
                           size=[box[3], box[4], box[5]],
                           yaw=box[6], label_class=cls_name,
                           confidence=-1.0)
            bev.points_inside_box = pts[:, :3]
            boxes.append(bev)
    if not points_list:
        return None
    return np.concatenate(points_list, axis=0), boxes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True,
                        help="path containing Area_N directories")
    parser.add_argument("--out_path", default=None)
    args = parser.parse_args()
    out_path = args.out_path or args.dataset_path
    out_dir = join(out_path, "original_pkl")
    make_dir(out_dir)

    rooms = sorted(glob.glob(join(args.dataset_path, "Area_*", "*")))
    for room in rooms:
        if not exists(join(room, "Annotations")):
            continue
        res = process_room(room)
        if res is None:
            continue
        area = Path(room).parent.name
        name = f"{area}_{Path(room).name}.pkl"
        with open(join(out_dir, name), "wb") as f:
            pickle.dump(res, f)
        print(f"wrote {name}: {res[0].shape[0]} points, "
              f"{len(res[1])} boxes")


if __name__ == "__main__":
    main()
