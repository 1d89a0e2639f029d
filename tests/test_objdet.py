"""End-to-end object detection tests on a synthetic mini-KITTI dataset."""

import os

import numpy as np
import pytest


def _write_kitti_frame(root, split, idx, rng):
    """Create one synthetic KITTI frame (velodyne/calib/label)."""
    vdir = root / split / "velodyne"
    cdir = root / split / "calib"
    ldir = root / split / "label_2"
    for d in (vdir, cdir, ldir):
        os.makedirs(d, exist_ok=True)

    # points in front of the car (x forward 0..20, y -8..8)
    pts = np.zeros((3000, 4), np.float32)
    pts[:, 0] = rng.uniform(1, 20, 3000)
    pts[:, 1] = rng.uniform(-8, 8, 3000)
    pts[:, 2] = rng.uniform(-2, 0.5, 3000)
    pts[:, 3] = rng.uniform(0, 1, 3000)
    pts.tofile(vdir / f"{idx:06d}.bin")

    # identity-ish calib: velo->cam swaps axes (x_cam = -y_velo,
    # y_cam = -z_velo, z_cam = x_velo)
    P = "7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 " \
        "0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 " \
        "0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00"
    R0 = "1 0 0 0 1 0 0 0 1"
    Tr = "0 -1 0 0 0 0 -1 0 1 0 0 0"
    lines = [f"P0: {P}", f"P1: {P}", f"P2: {P}", f"P3: {P}",
             f"R0_rect: {R0}", f"Tr_velo_to_cam: {Tr}",
             f"Tr_imu_to_velo: {Tr}"]
    (cdir / f"{idx:06d}.txt").write_text("\n".join(lines) + "\n")

    # two cars at fixed world positions; label in camera frame:
    # cam (x,y,z) = (-y_w, -z_w, x_w); y is box bottom in cam frame
    labels = []
    for (xw, yw) in ((8.0, 2.0), (14.0, -3.0)):
        zw_bottom = -1.6
        x_cam, y_cam, z_cam = -yw, -zw_bottom, xw
        h, w, l = 1.5, 1.7, 4.0
        labels.append(
            f"Car 0.0 0 0.0 300 160 360 200 {h} {w} {l} "
            f"{x_cam} {y_cam} {z_cam} 0.2")
    (ldir / f"{idx:06d}.txt").write_text("\n".join(labels) + "\n")


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(0)
    for i in range(4):
        _write_kitti_frame(root, "training", i, rng)
    for i in range(2):
        _write_kitti_frame(root, "testing", i, rng)
    return root


def _make_model():
    from open3d_ml_tpu.models import PointPillars
    return PointPillars(
        point_cloud_range=[0, -8, -3, 16, 8, 1],
        classes=["Car"],
        voxelize={"voxel_size": [0.5, 0.5, 4], "max_num_points": 16,
                  "max_voxels": [512, 512]},
        voxel_encoder={"feat_channels": [16]},
        scatter={"output_shape": [32, 32]},
        backbone={"in_channels": 16, "out_channels": [16, 32, 64],
                  "layer_nums": [1, 1, 1], "layer_strides": [2, 2, 2]},
        neck={"in_channels": [16, 32, 64], "out_channels": [16, 16, 16],
              "upsample_strides": [1, 2, 4]},
        head={"ranges": [[0, -8, -1.8, 16, 8, -1.8]],
              "sizes": [[1.7, 4.0, 1.5]], "rotations": [0, 1.57],
              "iou_thr": [[0.3, 0.5]], "score_thr": 0.05},
        max_points=4096, max_gt=8)


class TestKITTIReader:

    def test_read_frame(self, mini_kitti):
        from open3d_ml_tpu.datasets import KITTI
        ds = KITTI(dataset_path=str(mini_kitti), val_split=3)
        split = ds.get_split("training")
        assert len(split) == 3
        data = split.get_data(0)
        assert data["point"].shape[1] == 4
        assert len(data["bounding_boxes"]) == 2
        box = data["bounding_boxes"][0]
        # world-frame box position should be near (8, 2)
        np.testing.assert_allclose(box.center[:2], [8.0, 2.0], atol=0.1)
        assert box.label_class == "Car"
        val = ds.get_split("validation")
        assert len(val) == 1

    def test_to_xyzwhlr_roundtrip(self, mini_kitti):
        from open3d_ml_tpu.datasets import KITTI
        ds = KITTI(dataset_path=str(mini_kitti), val_split=3)
        box = ds.get_split("training").get_data(0)["bounding_boxes"][0]
        flat = box.to_xyzwhlr()
        assert flat.shape == (7,)
        # bottom z = center z - h/2
        np.testing.assert_allclose(flat[2], box.center[2] - box.size[1] / 2,
                                   atol=1e-5)


class TestPointPillarsTraining:

    @pytest.mark.slow
    def test_train_and_validate(self, mini_kitti, tmp_path):
        from open3d_ml_tpu.datasets import KITTI
        from open3d_ml_tpu.pipelines import ObjectDetection

        ds = KITTI(dataset_path=str(mini_kitti), val_split=3,
                   use_cache=False)
        model = _make_model()
        pipe = ObjectDetection(model, dataset=ds, max_epoch=0, batch_size=2,
                               val_batch_size=2, save_ckpt_freq=100,
                               validation_freq=1,
                               main_log_dir=str(tmp_path / "logs"),
                               train_sum_dir=str(tmp_path / "tb"),
                               optimizer={"lr": 1e-3}, num_workers=0,
                               overlaps=[0.25], similar_classes={})
        pipe.run_train()
        for k, v in pipe.losses.items():
            assert np.isfinite(v).all(), k

    @pytest.mark.slow
    def test_inference(self, mini_kitti, tmp_path):
        from open3d_ml_tpu.datasets import KITTI
        from open3d_ml_tpu.pipelines import ObjectDetection
        ds = KITTI(dataset_path=str(mini_kitti), val_split=3)
        model = _make_model()
        pipe = ObjectDetection(model, dataset=ds, batch_size=1,
                               main_log_dir=str(tmp_path / "logs"),
                               train_sum_dir=str(tmp_path / "tb"),
                               num_workers=0)
        data = ds.get_split("training").get_data(0)
        boxes = pipe.run_inference(data)
        assert isinstance(boxes, list)  # untrained => arbitrary detections

    @pytest.mark.slow
    def test_ckpt_save_resume(self, mini_kitti, tmp_path):
        """Objdet checkpoint roundtrip: save at epoch end, resume restores
        epoch + params (reference object_detection.py:542-576)."""
        import jax
        from open3d_ml_tpu.datasets import KITTI
        from open3d_ml_tpu.pipelines import ObjectDetection

        ds = KITTI(dataset_path=str(mini_kitti), val_split=3,
                   use_cache=False)
        model = _make_model()
        kwargs = dict(dataset=ds, max_epoch=0, batch_size=2,
                      val_batch_size=2, save_ckpt_freq=1,
                      validation_freq=100,
                      main_log_dir=str(tmp_path / "logs"),
                      train_sum_dir=str(tmp_path / "tb"),
                      optimizer={"lr": 1e-3}, num_workers=0,
                      overlaps=[0.25], similar_classes={})
        pipe = ObjectDetection(model, **kwargs)
        pipe.run_train()  # epoch 0 trains and saves
        saved = jax.tree_util.tree_leaves(pipe.state.params)

        pipe2 = ObjectDetection(_make_model(), **kwargs)
        pipe2.run_train()  # finds the ckpt, resumes past max_epoch
        restored = jax.tree_util.tree_leaves(pipe2.state.params)
        assert len(saved) == len(restored)
        for a, b in zip(saved, restored):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestPointRCNNPipeline:

    @pytest.mark.slow
    def test_rpn_training(self, mini_kitti, tmp_path):
        from open3d_ml_tpu.datasets import KITTI
        from open3d_ml_tpu.models import PointRCNN
        from open3d_ml_tpu.pipelines import ObjectDetection

        ds = KITTI(dataset_path=str(mini_kitti), val_split=3,
                   use_cache=False)
        model = PointRCNN(
            mode="RPN", npoints=1024, classes=["Car"],
            rpn={"backbone": {"npoints": [256, 64, 16, 4]},
                 "head": {"nms_pre": 256, "nms_post": 32,
                          "mean_size": [1.52, 1.63, 3.88]}},
            augment={"PointShuffle": True})
        pipe = ObjectDetection(model, dataset=ds, max_epoch=0, batch_size=1,
                               val_batch_size=1, save_ckpt_freq=100,
                               validation_freq=100,
                               main_log_dir=str(tmp_path / "logs"),
                               train_sum_dir=str(tmp_path / "tb"),
                               optimizer={"lr": 1e-3}, num_workers=0)
        pipe.run_train()
        for k, v in pipe.losses.items():
            assert np.isfinite(v).all(), k


class TestAssignment:

    def test_perfect_prediction_assigns_positives(self):
        """gt boxes equal to some anchors must produce positive matches."""
        import jax.numpy as jnp
        model = _make_model()
        anchors = model._anchors()  # [H, W, S, R, 7]
        h, w, s, r, _ = anchors.shape
        gt = np.zeros((8, 7), np.float32)
        gt[0] = anchors[h // 2, w // 2, 0, 0]
        gt[1] = anchors[h // 4, w // 4, 0, 1]
        out = model.assign_bboxes(
            jnp.asarray(gt)[None], jnp.zeros((1, 8), jnp.int32),
            jnp.asarray([2], jnp.int32))
        pos = np.asarray(out["pos_mask"])
        assert pos.sum() >= 2
        # the two exactly-matching anchors must be positive with ~0 deltas
        # (neighboring cells may legitimately also clear the IoU threshold)
        deltas = np.abs(np.asarray(out["target_deltas"])[pos]).max(axis=1)
        assert (deltas < 1e-4).sum() >= 2
