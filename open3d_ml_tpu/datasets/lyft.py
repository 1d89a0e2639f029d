"""Lyft Level-5 dataset reader (info-pickle format).

Rebuild of /root/reference/ml3d/datasets/lyft.py; format identical to the
NuScenes converter output.
"""

import logging
import os
import pickle
from os.path import join
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation as R

from ..utils import DATASET, make_dir
from .base_dataset import BaseDataset
from .nuscenes import NuScenesSplit
from .utils import BEVBox3D

log = logging.getLogger(__name__)


class Lyft(BaseDataset):

    def __init__(self,
                 dataset_path,
                 info_path=None,
                 name="Lyft",
                 cache_dir="./logs/cache",
                 use_cache=False,
                 test_result_folder="./test",
                 **kwargs):
        if info_path is None:
            info_path = dataset_path
        super().__init__(dataset_path=dataset_path,
                         info_path=info_path,
                         name=name,
                         cache_dir=cache_dir,
                         use_cache=use_cache,
                         test_result_folder=test_result_folder,
                         **kwargs)
        self.num_classes = 9
        self.label_to_names = self.get_label_to_names()

        self.train_info = {}
        self.test_info = {}
        self.val_info = {}
        for split, attr in (("train", "train_info"), ("val", "val_info"),
                            ("test", "test_info")):
            p = join(info_path, f"infos_{split}.pkl")
            if os.path.exists(p):
                with open(p, "rb") as f:
                    setattr(self, attr, pickle.load(f))

    @staticmethod
    def get_label_to_names():
        return {
            0: "ignore", 1: "bicycle", 2: "bus", 3: "car",
            4: "emergency_vehicle", 5: "motorcycle", 6: "other_vehicle",
            7: "pedestrian", 8: "truck", 9: "animal"
        }

    @staticmethod
    def read_lidar(path):
        assert Path(path).exists()
        return np.fromfile(path, dtype=np.float32).reshape(-1, 5)

    @staticmethod
    def read_label(info, calib):
        mask = info["num_lidar_pts"] != 0
        boxes = info["gt_boxes"][mask]
        names = info["gt_names"][mask]
        objects = []
        for name, box in zip(names, boxes):
            center = [float(box[0]), float(box[1]), float(box[2])]
            size = [float(box[3]), float(box[5]), float(box[4])]
            ry = float(box[6])
            yaw = ry - np.pi
            yaw = yaw - np.floor(yaw / (2 * np.pi) + 0.5) * 2 * np.pi
            objects.append(
                BEVBox3D(center, size, yaw, name, -1.0, calib["world_cam"]))
            objects[-1].yaw = ry
        return objects

    def get_split(self, split):
        return NuScenesSplit(self, split=split)

    def get_split_list(self, split):
        if split in ("train", "training"):
            return self.train_info
        if split in ("test", "testing"):
            return self.test_info
        if split in ("val", "validation"):
            return self.val_info
        raise ValueError(f"Invalid split {split}")

    def is_tested(self, attr):
        return False

    def save_test_result(self, results, attrs):
        make_dir(self.cfg.test_result_folder)
        for attr, res in zip(attrs, results):
            path = join(self.cfg.test_result_folder, attr["name"] + ".txt")
            with open(path, "w") as f:
                for box in res:
                    f.write(box.to_kitti_format(box.confidence))
                    f.write("\n")


DATASET._register_module(Lyft)
