#!/usr/bin/env python
"""Convert raw ScanNet v2 scans into the reader's npy format.

Rebuild of /root/reference/scripts/preprocess_scannet.py: per scene, read the
_vh_clean_2.ply mesh vertices + aggregation/segment jsons, and write
<scene>_vert.npy (xyz+rgb), <scene>_sem_label.npy, <scene>_ins_label.npy and
<scene>_bbox.npy (axis-aligned boxes with nyu40 class ids).
"""

import argparse
import json
import sys
from os.path import join
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.datasets.utils.ply import read_ply

DONT_CARE_IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39])


def read_label_map(tsv_path, label_from="raw_category", label_to="nyu40id"):
    mapping = {}
    with open(tsv_path) as f:
        header = f.readline().rstrip().split("\t")
        fi = header.index(label_from)
        ti = header.index(label_to)
        for line in f:
            parts = line.rstrip().split("\t")
            mapping[parts[fi]] = int(parts[ti])
    return mapping


def process_scene(scans_dir, scene, label_map, out_dir):
    prefix = join(scans_dir, scene, scene)
    ply = read_ply(prefix + "_vh_clean_2.ply")
    verts = np.stack(
        [ply["x"], ply["y"], ply["z"], ply["red"], ply["green"],
         ply["blue"]], axis=1).astype(np.float32)

    with open(prefix + ".aggregation.json") as f:
        agg = json.load(f)
    with open(prefix + "_vh_clean_2.0.010000.segs.json") as f:
        segs = json.load(f)
    seg_to_verts = {}
    for i, seg in enumerate(segs["segIndices"]):
        seg_to_verts.setdefault(seg, []).append(i)

    n = verts.shape[0]
    sem = np.zeros((n,), np.int64)
    ins = np.zeros((n,), np.int64)
    boxes = []
    for obj in agg["segGroups"]:
        nyu40 = label_map.get(obj["label"], 0)
        idxs = []
        for seg in obj["segments"]:
            idxs.extend(seg_to_verts.get(seg, []))
        idxs = np.asarray(idxs, np.int64)
        if len(idxs) == 0:
            continue
        sem[idxs] = nyu40
        ins[idxs] = obj["objectId"] + 1
        if nyu40 in DONT_CARE_IDS:
            pts = verts[idxs, :3]
            mn, mx = pts.min(0), pts.max(0)
            center = (mn + mx) / 2
            size = mx - mn
            boxes.append(np.concatenate([center, size, [nyu40]]))
    boxes = np.asarray(boxes) if boxes else np.zeros((0, 7))

    np.save(join(out_dir, scene + "_vert.npy"), verts)
    np.save(join(out_dir, scene + "_sem_label.npy"), sem)
    np.save(join(out_dir, scene + "_ins_label.npy"), ins)
    np.save(join(out_dir, scene + "_bbox.npy"), boxes)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True,
                        help="ScanNet root containing scans/ and the "
                             "scannetv2-labels.combined.tsv")
    parser.add_argument("--out_path", required=True)
    args = parser.parse_args()

    scans_dir = join(args.dataset_path, "scans")
    label_map = read_label_map(
        join(args.dataset_path, "scannetv2-labels.combined.tsv"))
    Path(args.out_path).mkdir(parents=True, exist_ok=True)
    scenes = sorted(p.name for p in Path(scans_dir).iterdir() if p.is_dir())
    for i, scene in enumerate(scenes):
        process_scene(scans_dir, scene, label_map, args.out_path)
        print(f"[{i + 1}/{len(scenes)}] {scene}")


if __name__ == "__main__":
    main()
