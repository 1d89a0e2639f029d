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
