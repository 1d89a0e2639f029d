"""Dataset reader tests over synthetic on-disk fixtures."""

import os
import pickle

import numpy as np
import pytest


class TestPLY:

    def test_roundtrip_binary(self, tmp_path):
        from open3d_ml_tpu.datasets.utils.ply import read_ply, write_ply
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        labels = rng.integers(0, 9, 100).astype(np.int32)
        p = tmp_path / "cloud.ply"
        write_ply(str(p), [pts, labels], ["x", "y", "z", "class"])
        data = read_ply(str(p))
        np.testing.assert_allclose(
            np.stack([data["x"], data["y"], data["z"]], 1), pts)
        np.testing.assert_array_equal(data["class"], labels)

    def test_ascii(self, tmp_path):
        p = tmp_path / "a.ply"
        p.write_text("ply\nformat ascii 1.0\nelement vertex 2\n"
                     "property float x\nproperty float y\nproperty float z\n"
                     "end_header\n1 2 3\n4 5 6\n")
        from open3d_ml_tpu.datasets.utils.ply import read_ply
        data = read_ply(str(p))
        np.testing.assert_allclose(data["x"], [1, 4])
        np.testing.assert_allclose(data["z"], [3, 6])


class TestToronto3D:

    def test_read(self, tmp_path):
        from open3d_ml_tpu.datasets import Toronto3D
        from open3d_ml_tpu.datasets.utils.ply import write_ply
        rng = np.random.default_rng(0)
        for f in ("L001.ply", "L002.ply", "L003.ply", "L004.ply"):
            pts = rng.uniform(0, 10, (50, 3)) + Toronto3D.UTM_OFFSET
            rgb = rng.uniform(0, 255, (50, 3)).astype(np.float32)
            lab = rng.integers(0, 9, 50).astype(np.int32)
            write_ply(str(tmp_path / f),
                      [pts.astype(np.float64).astype(np.float32), rgb, lab],
                      ["x", "y", "z", "red", "green", "blue",
                       "scalar_Label"])
        ds = Toronto3D(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 3
        data = split.get_data(0)
        assert data["point"].shape == (50, 3)
        assert data["point"].max() < 100  # UTM offset removed
        assert data["feat"].shape == (50, 3)


class TestParisLille3D:

    def test_read(self, tmp_path):
        from open3d_ml_tpu.datasets import ParisLille3D
        from open3d_ml_tpu.datasets.utils.ply import write_ply
        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "training_10_classes")
        os.makedirs(tmp_path / "test_10_classes")
        for f in ("Lille1.ply", "Lille2.ply", "Paris.ply"):
            pts = rng.uniform(0, 10, (40, 3)).astype(np.float32)
            lab = rng.integers(0, 10, 40).astype(np.int32)
            write_ply(str(tmp_path / "training_10_classes" / f),
                      [pts, lab], ["x", "y", "z", "class"])
        pts = rng.uniform(0, 10, (40, 3)).astype(np.float32)
        write_ply(str(tmp_path / "test_10_classes" / "T1.ply"), [pts],
                  ["x", "y", "z"])
        ds = ParisLille3D(dataset_path=str(tmp_path))
        assert len(ds.get_split("training")) == 2
        assert len(ds.get_split("validation")) == 1
        assert len(ds.get_split("test")) == 1
        d = ds.get_split("training").get_data(0)
        assert d["point"].shape == (40, 3)
        assert d["label"].shape == (40,)


class TestS3DIS:

    def test_read(self, tmp_path):
        from open3d_ml_tpu.datasets import S3DIS
        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "original_pkl")
        for name in ("Area_1_office_1.pkl", "Area_3_office_2.pkl"):
            pc = rng.uniform(0, 5, (60, 7)).astype(np.float32)
            pc[:, 6] = rng.integers(0, 13, 60)
            with open(tmp_path / "original_pkl" / name, "wb") as f:
                pickle.dump((pc, []), f)
        ds = S3DIS(dataset_path=str(tmp_path), test_area_idx=3)
        assert len(ds.get_split("training")) == 1
        assert len(ds.get_split("test")) == 1
        d = ds.get_split("training").get_data(0)
        assert d["point"].shape == (60, 3)
        assert d["feat"].shape == (60, 3)


class TestSemantic3D:

    def test_read(self, tmp_path):
        from open3d_ml_tpu.datasets import Semantic3D
        rng = np.random.default_rng(0)
        pc = rng.uniform(0, 10, (30, 7)).astype(np.float32)
        np.savetxt(tmp_path / "scan1.txt", pc, fmt="%.4f")
        np.savetxt(tmp_path / "scan1.labels",
                   rng.integers(0, 9, 30), fmt="%d")
        np.savetxt(tmp_path / "scan2.txt", pc, fmt="%.4f")  # no labels=test
        ds = Semantic3D(dataset_path=str(tmp_path), val_files=[])
        assert len(ds.get_split("training")) == 1
        assert len(ds.get_split("test")) == 1
        d = ds.get_split("training").get_data(0)
        assert d["point"].shape == (30, 3)
        assert d["feat"].shape == (30, 3)
        assert d["label"].shape == (30,)


class TestWaymo:

    def test_read(self, tmp_path):
        from open3d_ml_tpu.datasets import Waymo
        rng = np.random.default_rng(0)
        for d in ("velodyne", "calib", "label_all"):
            os.makedirs(tmp_path / d, exist_ok=True)
        pts = np.zeros((500, 6), np.float32)
        pts[:, 0] = rng.uniform(1, 20, 500)
        pts[:, 1] = rng.uniform(-5, 5, 500)
        pts.tofile(tmp_path / "velodyne" / "train_000.bin")
        P = " ".join(["7.2e+02", "0", "6.0e+02", "0", "0", "7.2e+02",
                      "1.7e+02", "0", "0", "0", "1", "0"])
        lines = [f"P0: {P}", f"P1: {P}", f"P2: {P}", f"P3: {P}",
                 "R0_rect: 1 0 0 0 1 0 0 0 1",
                 "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0"]
        (tmp_path / "calib" / "train_000.txt").write_text(
            "\n".join(lines) + "\n")
        (tmp_path / "label_all" / "train_000.txt").write_text(
            "VEHICLE 0 0 0 300 160 360 200 1.5 1.7 4.0 -2.0 1.6 8.0 0.2\n")
        ds = Waymo(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 1
        data = split.get_data(0)
        assert data["point"].shape == (500, 6)
        assert len(data["bounding_boxes"]) == 1


class TestNuScenesAndLyft:

    def test_read_infos(self, tmp_path):
        import pickle
        from open3d_ml_tpu.datasets import NuScenes
        rng = np.random.default_rng(0)
        pc = rng.uniform(-10, 10, (300, 5)).astype(np.float32)
        pc_path = tmp_path / "sweep_0.bin"
        pc.tofile(pc_path)
        infos = [{
            "lidar_path": str(pc_path),
            "lidar2ego_rot": [0, 0, 0, 1],  # identity quaternion (xyzw)
            "lidar2ego_tr": [0, 0, 1.8],
            "num_lidar_pts": np.array([30, 0]),
            "gt_boxes": np.array([[5, 2, 0, 1.9, 4.6, 1.7, 0.4],
                                  [8, 1, 0, 1.9, 4.6, 1.7, 0.0]]),
            "gt_names": np.array(["car", "truck"]),
        }]
        with open(tmp_path / "infos_train.pkl", "wb") as f:
            pickle.dump(infos, f)
        ds = NuScenes(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 1
        data = split.get_data(0)
        assert data["point"].shape == (300, 5)
        # only the box with lidar points survives
        assert len(data["bounding_boxes"]) == 1
        assert data["bounding_boxes"][0].label_class == "car"


class TestTransforms:

    def test_trans_crop_pc(self):
        from scipy.spatial import cKDTree
        from open3d_ml_tpu.datasets.utils import trans_crop_pc
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 10, (500, 3)).astype(np.float32)
        labels = rng.integers(0, 5, 500).astype(np.int32)
        tree = cKDTree(pts)
        p, f, l, idx = trans_crop_pc(pts, None, labels, tree, 7, 64)
        assert p.shape == (64, 3)
        assert l.shape == (64,)
        assert 7 in idx  # center point included


class TestScannet:

    def test_read(self, tmp_path):
        from open3d_ml_tpu.datasets import Scannet
        rng = np.random.default_rng(0)
        scene = "scene0000_00"
        n = 80
        np.save(tmp_path / f"{scene}_vert.npy",
                rng.uniform(0, 4, (n, 6)).astype(np.float32))
        np.save(tmp_path / f"{scene}_sem_label.npy",
                rng.choice([3, 4, 5, 39], n))
        np.save(tmp_path / f"{scene}_ins_label.npy",
                rng.integers(0, 5, n))
        boxes = np.zeros((2, 7))
        boxes[:, 3:6] = 1.0
        boxes[:, 6] = [3, 39]
        np.save(tmp_path / f"{scene}_bbox.npy", boxes)
        ds = Scannet(dataset_path=str(tmp_path))
        split = ds.get_split("training")  # scene0000_00 is in train list
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (n, 3)
        assert len(d["bounding_boxes"]) == 2
        assert d["label"].max() < 18


class TestSemanticKITTI:

    def test_read_and_remap(self, tmp_path):
        from open3d_ml_tpu.datasets import SemanticKITTI
        rng = np.random.default_rng(0)
        seq = tmp_path / "dataset" / "sequences" / "00"
        os.makedirs(seq / "velodyne")
        os.makedirs(seq / "labels")
        pts = rng.uniform(-20, 20, (300, 4)).astype(np.float32)
        pts.tofile(seq / "velodyne" / "000000.bin")
        # raw semantic ids: 40=road(->9), 10=car(->1), 0=unlabeled(->0);
        # upper 16 bits carry instance ids which must be stripped
        raw = np.zeros(300, np.uint32)
        raw[:100] = 40
        raw[100:200] = 10 | (7 << 16)
        raw.astype(np.uint32).tofile(seq / "labels" / "000000.label")
        ds = SemanticKITTI(dataset_path=str(tmp_path),
                           training_split=["00"])
        split = ds.get_split("training")
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (300, 3)
        assert d["label"].shape == (300,)
        labels = d["label"]
        assert set(np.unique(labels[:100])) == {9}
        assert set(np.unique(labels[100:200])) == {1}
        assert set(np.unique(labels[200:])) == {0}


class TestCustom3D:

    def test_npy_dir(self, tmp_path):
        from open3d_ml_tpu.datasets import Custom3D
        rng = np.random.default_rng(0)
        for split in ("train", "val", "test"):
            os.makedirs(tmp_path / split)
        np.save(tmp_path / "train" / "a.npy",
                rng.uniform(0, 5, (50, 6)).astype(np.float32))
        np.save(tmp_path / "val" / "b.npy",
                {"point": rng.uniform(0, 5, (40, 3)).astype(np.float32),
                 "label": rng.integers(0, 3, 40).astype(np.int32)})
        ds = Custom3D(dataset_path=str(tmp_path))
        tr = ds.get_split("training")
        assert len(tr) == 1
        d = tr.get_data(0)
        assert d["point"].shape == (50, 3)
        assert d["feat"].shape == (50, 3)
        va = ds.get_split("validation")
        dv = va.get_data(0)
        assert dv["point"].shape == (40, 3)
        assert dv["label"].max() < 3


class TestPandaset:

    def test_read(self, tmp_path):
        import pandas as pd
        from open3d_ml_tpu.datasets import Pandaset
        rng = np.random.default_rng(0)
        seq = tmp_path / "001"
        os.makedirs(seq / "lidar")
        os.makedirs(seq / "annotations" / "semseg")
        n = 60
        df = pd.DataFrame({
            "x": rng.uniform(-5, 5, n), "y": rng.uniform(-5, 5, n),
            "z": rng.uniform(-2, 1, n), "i": rng.uniform(0, 255, n),
            "t": np.zeros(n), "d": np.zeros(n),
        })
        df.to_pickle(seq / "lidar" / "00.pkl")
        pd.DataFrame({"class": rng.integers(1, 43, n)}).to_pickle(
            seq / "annotations" / "semseg" / "00.pkl")
        ds = Pandaset(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (n, 3)
        assert d["feat"].shape == (n, 1)
        assert d["label"].shape == (n,)


class TestShapeNet:

    def test_read(self, tmp_path):
        import json
        from open3d_ml_tpu.datasets import ShapeNet
        rng = np.random.default_rng(0)
        sub = tmp_path / "shapenetcore_partanno_segmentation_benchmark_v0"
        os.makedirs(sub / "02691156" / "points")
        os.makedirs(sub / "02691156" / "points_label")
        os.makedirs(sub / "train_test_split")
        (sub / "synsetoffset2category.txt").write_text(
            "Airplane\t02691156\n")
        pts = rng.uniform(-1, 1, (80, 3)).astype(np.float32)
        np.savetxt(sub / "02691156" / "points" / "m1.pts", pts)
        np.savetxt(sub / "02691156" / "points_label" / "m1.seg",
                   rng.integers(1, 5, 80), fmt="%d")
        for s, files in (("train", ["shape_data/02691156/m1"]),
                         ("val", []), ("test", [])):
            (sub / "train_test_split" /
             f"shuffled_{s}_file_list.json").write_text(json.dumps(files))
        ds = ShapeNet(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (80, 3)
        assert d["label"].shape[0] in (1, 80)  # class or part labels


class TestMatterportObjects:

    def test_read(self, tmp_path):
        import joblib
        from open3d_ml_tpu.datasets import MatterportObjects
        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "training" / "pc")
        os.makedirs(tmp_path / "training" / "boxes")
        os.makedirs(tmp_path / "testing" / "pc")
        pc = rng.uniform(-3, 3, (70, 3)).astype(np.float32)
        joblib.dump(pc, tmp_path / "training" / "pc" / "s0.bin")
        boxes = [("chair", 0, 0, 10, 10, 1.0, 2.0, 0.5, 0.8, 0.6, 1.1,
                  30.0)]
        joblib.dump(boxes, tmp_path / "training" / "boxes" / "s0.txt")
        joblib.dump(pc, tmp_path / "testing" / "pc" / "s1.bin")
        ds = MatterportObjects(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (70, 3)
        assert len(d["bounding_boxes"]) == 1
        assert d["bounding_boxes"][0].label_class == "chair"
        assert len(ds.get_split("test")) == 1


class TestSunRGBD:

    def test_read(self, tmp_path):
        import pickle
        from open3d_ml_tpu.datasets import SunRGBD
        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "depth")
        os.makedirs(tmp_path / "label")
        pc = rng.uniform(-3, 3, (60, 6)).astype(np.float32)
        np.save(tmp_path / "depth" / "000001.npy", pc)
        # (name, cx, cy, cz, w/2, l/2, h/2, ori_x, ori_y)
        boxes = [np.array(["bed", 1.0, 2.0, 0.4, 0.8, 1.0, 0.3, 1.0, 0.2],
                          object)]
        boxes[0] = ["bed", 1.0, 2.0, 0.4, 0.8, 1.0, 0.3, 1.0, 0.2]
        with open(tmp_path / "label" / "000001.pkl", "wb") as f:
            pickle.dump(boxes, f)
        (tmp_path / "train_data_idx.txt").write_text("000001\n")
        (tmp_path / "val_data_idx.txt").write_text("")
        ds = SunRGBD(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (60, 3)
        assert d["feat"].shape == (60, 3)
        assert len(d["bounding_boxes"]) == 1
        assert d["bounding_boxes"][0].label_class == "bed"


class TestTUMFacade:

    def test_read(self, tmp_path):
        from open3d_ml_tpu.datasets import TUMFacade
        rng = np.random.default_rng(0)
        crs = tmp_path / "pointclouds" / "annotatedLocalCRS"
        os.makedirs(crs / "training_files")
        os.makedirs(crs / "validation_files")
        os.makedirs(crs / "test_files")
        n = 40
        pts = rng.uniform(0, 4, (n, 3)).astype(np.float32)
        labels = rng.integers(0, 3, n).astype(np.int32)
        header = ("# .PCD v0.7 - Point Cloud Data file format\n"
                  "VERSION 0.7\nFIELDS x y z label\nSIZE 4 4 4 4\n"
                  "TYPE F F F I\nCOUNT 1 1 1 1\n"
                  f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                  f"POINTS {n}\nDATA ascii\n")
        rows = "\n".join(
            f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {l}"
            for p, l in zip(pts, labels))
        (crs / "training_files" / "f0.pcd").write_text(header + rows + "\n")
        ds = TUMFacade(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (n, 3)
        assert d["label"].shape == (n,)


class TestLyft:

    def test_read_infos(self, tmp_path):
        from open3d_ml_tpu.datasets import Lyft
        rng = np.random.default_rng(0)
        pc = rng.uniform(-10, 10, (200, 5)).astype(np.float32)
        pc_path = tmp_path / "host_a_lidar0.bin"
        pc.tofile(pc_path)
        infos = [{
            "lidar_path": str(pc_path),
            "lidar2ego_rot": [0, 0, 0, 1],
            "lidar2ego_tr": [0, 0, 1.5],
            "num_lidar_pts": np.array([12, 0]),
            "gt_boxes": np.array([[3, 1, 0, 1.9, 4.5, 1.6, 0.2],
                                  [9, 2, 0, 1.9, 4.5, 1.6, 0.1]]),
            "gt_names": np.array(["car", "bus"]),
        }]
        with open(tmp_path / "infos_train.pkl", "wb") as f:
            pickle.dump(infos, f)
        ds = Lyft(dataset_path=str(tmp_path))
        split = ds.get_split("training")
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (200, 5)
        assert len(d["bounding_boxes"]) == 1
        assert d["bounding_boxes"][0].label_class == "car"


class TestArgoverse:

    def test_read_infos(self, tmp_path):
        from open3d_ml_tpu.datasets import Argoverse
        from open3d_ml_tpu.datasets.utils.ply import write_ply
        rng = np.random.default_rng(0)
        pts = rng.uniform(-20, 20, (150, 3)).astype(np.float32)
        pc_path = tmp_path / "sweep0.ply"
        write_ply(str(pc_path), [pts], ["x", "y", "z"])
        infos = [{
            "num_pc": 1,
            "lidar_path": [str(pc_path)],
            "bbox": [[{
                "label_class": "VEHICLE",
                "center": np.array([2.0, 1.0, 0.3]),
                "w": 1.9, "h": 1.6, "l": 4.5,
                "2d_coord": np.array([[0.0, 0.0], [1.0, 2.0]]),
            }]],
        }]
        os.makedirs(tmp_path / "infos", exist_ok=True)
        with open(tmp_path / "infos" / "infos_train.pkl", "wb") as f:
            pickle.dump(infos, f)
        ds = Argoverse(dataset_path=str(tmp_path),
                       info_path=str(tmp_path / "infos"))
        split = ds.get_split("training")
        assert len(split) == 1
        d = split.get_data(0)
        assert d["point"].shape == (150, 3)
        assert len(d["bounding_boxes"]) == 1
        assert d["bounding_boxes"][0].label_class == "VEHICLE"
