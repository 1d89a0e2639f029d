"""PointRCNN / PointNet++ tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
class TestPointnet2:

    def test_sa_module(self):
        from open3d_ml_tpu.models.pointnet2 import PointnetSAModuleMSG
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.standard_normal((256, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((256, 8)), jnp.float32)
        m = PointnetSAModuleMSG(npoint=64, radii=(0.5, 1.0),
                                nsamples=(8, 16),
                                mlps=((16, 16), (16, 32)))
        v = m.init(jax.random.PRNGKey(0), xyz, feats)
        new_xyz, new_feats = m.apply(v, xyz, feats)
        assert new_xyz.shape == (64, 3)
        assert new_feats.shape == (64, 48)  # 16 + 32

    def test_backbone(self):
        from open3d_ml_tpu.models.pointnet2 import Pointnet2MSG
        rng = np.random.default_rng(0)
        pc = jnp.asarray(rng.standard_normal((512, 3)), jnp.float32)
        net = Pointnet2MSG(
            in_channels=0,
            sa_npoints=(128, 32, 8, 2),
            sa_radii=((0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0)),
            sa_nsamples=((8, 16), (8, 16), (8, 16), (8, 16)),
            sa_mlps=(((16, 16, 32), (32, 32, 64)),
                     ((64, 64, 128), (64, 96, 128)),
                     ((128, 196, 256), (128, 196, 256)),
                     ((256, 256, 512), (256, 384, 512))),
            fp_mlps=((128, 128), (256, 256), (512, 512), (512, 512)))
        v = net.init(jax.random.PRNGKey(0), pc)
        xyz, feats = net.apply(v, pc)
        assert xyz.shape == (512, 3)
        assert feats.shape == (512, 128)


@pytest.mark.slow
class TestPointRCNN:

    @pytest.fixture(scope="class")
    def rpn_setup(self):
        from open3d_ml_tpu.models import PointRCNN
        model = PointRCNN(mode="RPN", npoints=1024,
                          rpn={"backbone": {"npoints": [256, 64, 16, 4]},
                               "head": {"nms_pre": 512, "nms_post": 64}})
        net = model.get_net()
        rng = np.random.default_rng(0)
        pts = {"point": jnp.asarray(rng.uniform(-10, 10, (2, 1024, 3)),
                                    jnp.float32)}
        key = jax.random.PRNGKey(0)
        v = net.init({"params": key, "dropout": key}, pts, training=False)
        return model, net, v, pts, rng

    def test_rpn_forward(self, rpn_setup):
        model, net, v, pts, rng = rpn_setup
        out = net.apply(v, pts, training=False)
        assert out["cls"].shape == (2, 1024, 1)
        assert out["reg"].shape == (2, 1024,
                                    model.rpn_head_cfg.reg_channels)

    def test_proposal_layer(self, rpn_setup):
        model, net, v, pts, rng = rpn_setup
        out = net.apply(v, pts, training=False)
        cls, reg, xyz = out["cls"], out["reg"], out["xyz"]
        boxes, scores, valid = model.proposal_layer(cls[0][:, 0], reg[0],
                                                    xyz[0])
        assert boxes.shape == (64, 7)
        assert bool(jnp.isfinite(boxes[valid]).all())

    def test_rpn_loss(self, rpn_setup):
        model, net, v, pts, rng = rpn_setup
        out = net.apply(v, pts, training=False)
        labels = jnp.asarray(rng.integers(-1, 2, (2, 1024)), jnp.int32)
        regs = jnp.asarray(rng.uniform(-1, 1, (2, 1024, 7)), jnp.float32)
        losses = model.rpn_loss(out, {"labels": labels, "bboxes": regs})
        assert np.isfinite(float(losses["cls"]))
        assert np.isfinite(float(losses["reg"]))

    def test_roipool(self):
        from open3d_ml_tpu.models.point_rcnn import roipool3d
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(-10, 10, (500, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((500, 4)), jnp.float32)
        rois = jnp.asarray([[0, 1, 5, 1.5, 1.6, 3.9, 0.3],
                            [50, 1, 70, 1.5, 1.6, 3.9, 0.0]], jnp.float32)
        pooled, empty = roipool3d(pts, feats, rois, 1.0, 64)
        assert pooled.shape == (2, 64, 7)
        assert bool(empty[1])  # far-away roi has no points

    def test_decode_encode_consistency(self):
        """Bin-decoding a one-hot-perfect regression recovers the target."""
        from open3d_ml_tpu.models.point_rcnn import decode_bbox_target
        # anchor points at origin; target at (1.2, 0.3, -0.7)
        roi = jnp.zeros((1, 3))
        loc_scope, loc_bin = 3.0, 0.5
        per_loc = int(loc_scope / loc_bin) * 2
        nhb = 12
        reg = np.zeros((1, per_loc * 4 + 1 + nhb * 2 + 3), np.float32)
        tx, ty, tz = 1.2, 0.3, -0.7
        x_bin = int((tx + loc_scope) / loc_bin)
        z_bin = int((tz + loc_scope) / loc_bin)
        reg[0, x_bin] = 10  # one-hot logits
        reg[0, per_loc + z_bin] = 10
        reg[0, per_loc * 2 + x_bin] = (tx + loc_scope - (x_bin + 0.5) *
                                       loc_bin) / loc_bin
        reg[0, per_loc * 3 + z_bin] = (tz + loc_scope - (z_bin + 0.5) *
                                       loc_bin) / loc_bin
        reg[0, per_loc * 4] = ty  # y offset
        box = decode_bbox_target(roi, jnp.asarray(reg), loc_scope, loc_bin,
                                 nhb, [1.5])
        np.testing.assert_allclose(np.asarray(box)[0, :3], [tx, ty, tz],
                                   atol=1e-5)


class TestPointRCNNStage2:

    @pytest.mark.slow
    def test_rcnn_mode_train_and_loss(self):
        from open3d_ml_tpu.models import PointRCNN
        model = PointRCNN(
            mode="RCNN", npoints=512,
            rpn={"backbone": {"npoints": [128, 32, 8, 2]},
                 "head": {"nms_pre": 256, "nms_post": 32,
                          "mean_size": [1.52, 1.63, 3.88]}},
            rcnn={"SA_config": {"npoints": [32, 8, -1],
                                "radius": [0.2, 0.4, 100],
                                "nsample": [16, 16, 16],
                                "mlps": [[64, 64], [64, 128], [128, 256]]},
                  "xyz_up_layer": [64, 64],
                  "cls_out_ch": [128], "reg_out_ch": [128],
                  "head": {"nms_pre": 32, "nms_post": 32,
                           "get_ry_fine": True, "loc_scope": 1.5,
                           "num_head_bin": 9,
                           "mean_size": [1.52, 1.63, 3.88],
                           "nms_thres": 0.1},
                  "target_head": {"num_points": 64, "roi_per_image": 16}})
        net = model.get_net()
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(0, 30, (1, 512, 3)), jnp.float32)
        gt = np.zeros((1, 24, 7), np.float32)
        gt[0, 0] = [15, 1, 15, 1.5, 1.6, 3.9, 0.3]
        batch = {"point": pts, "bboxes": jnp.asarray(gt),
                 "bbox_count": jnp.asarray([1], jnp.int32)}
        key = jax.random.PRNGKey(0)
        v = net.init({"params": key, "dropout": key, "sampling": key},
                     batch, training=True)
        out, upd = net.apply(v, batch, training=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": key, "sampling": key})
        assert out["cls"].shape[1] == 16  # roi_per_image
        losses = model.rcnn_loss(out, batch)
        assert np.isfinite(float(losses["cls"]))
        assert np.isfinite(float(losses["reg"]))
        # eval path + refined decoding
        out_e = net.apply(v, batch, training=False)
        res = model.inference_end(
            jax.tree.map(np.asarray, out_e), {"calib": None})
        assert isinstance(res[0], list)

    @pytest.mark.slow
    def test_freeze_rpn_mask(self):
        from open3d_ml_tpu.models import PointRCNN
        model = PointRCNN(mode="RCNN", npoints=256,
                          rpn={"backbone": {"npoints": [64, 16, 4, 2]}})
        net = model.get_net()
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(0, 30, (1, 256, 3)), jnp.float32)
        batch = {"point": pts,
                 "bboxes": jnp.zeros((1, 24, 7)),
                 "bbox_count": jnp.asarray([0], jnp.int32)}
        key = jax.random.PRNGKey(0)
        v = net.init({"params": key, "dropout": key, "sampling": key},
                     batch, training=True)
        mask = model.freeze_rpn_mask(v["params"])
        import jax as _jax
        flat = _jax.tree_util.tree_flatten_with_path(mask)[0]
        rpn_flags = [val for path, val in flat
                     if any(getattr(p, "key", "") == "rpn" for p in path)]
        rcnn_flags = [val for path, val in flat
                      if any(getattr(p, "key", "") == "rcnn" for p in path)]
        assert rpn_flags and not any(rpn_flags)
        assert rcnn_flags and all(rcnn_flags)


@pytest.mark.slow
class TestRoiJitterAug:
    """aug_roi_by_noise: batched rework of the reference's per-roi
    rejection-sampling jitter (point_rcnn.py:1553-1617)."""

    def _boxes(self, rng, n):
        b = np.zeros((n, 7), np.float32)
        b[:, 0] = rng.uniform(-10, 10, n)
        b[:, 1] = rng.uniform(1, 2, n)        # y bottom
        b[:, 2] = rng.uniform(5, 40, n)
        b[:, 3] = 1.5                          # h
        b[:, 4] = 1.6                          # w
        b[:, 5] = 3.9                          # l
        b[:, 6] = rng.uniform(-np.pi, np.pi, n)
        return b

    def test_jitter_respects_pos_thresh(self):
        import jax
        import jax.numpy as jnp
        from open3d_ml_tpu.models.point_rcnn import aug_roi_by_noise

        rng = np.random.default_rng(0)
        gt = self._boxes(rng, 16)
        rois = gt.copy()  # perfect rois: iou_src = 1
        iou_src = np.ones(16, np.float32)
        out_rois, out_iou = jax.jit(
            lambda r, g, i, k: aug_roi_by_noise(r, g, i, k, pos_thresh=0.55,
                                                aug_times=10))(
            jnp.asarray(rois), jnp.asarray(gt), jnp.asarray(iou_src),
            jax.random.PRNGKey(0))
        out_rois, out_iou = np.asarray(out_rois), np.asarray(out_iou)
        assert out_rois.shape == (16, 7)
        # every reported iou clears the threshold (a passing jitter or the
        # kept original whose iou_src is 1.0): a failing-fallback is
        # astronomically unlikely with 10 attempts around a perfect roi
        assert (out_iou >= 0.55).all()
        # at least some rois actually moved
        assert (np.abs(out_rois - rois).max(axis=1) > 1e-6).any()
        # jitters are bounded by the largest range config (pos 1.0)
        assert np.abs(out_rois[:, 0:3] - rois[:, 0:3]).max() <= 1.0 + 1e-5

    def test_aug_times_zero_is_identity(self):
        import jax
        import jax.numpy as jnp
        from open3d_ml_tpu.models.point_rcnn import aug_roi_by_noise

        rng = np.random.default_rng(1)
        gt = self._boxes(rng, 8)
        rois = self._boxes(rng, 8)
        iou_src = rng.uniform(0, 1, 8).astype(np.float32)
        out_rois, out_iou = aug_roi_by_noise(
            jnp.asarray(rois), jnp.asarray(gt), jnp.asarray(iou_src),
            jax.random.PRNGKey(1), pos_thresh=0.55, aug_times=0)
        np.testing.assert_array_equal(np.asarray(out_rois), rois)
        np.testing.assert_array_equal(np.asarray(out_iou), iou_src)

    def test_far_rois_take_last_candidate(self):
        """When no jitter can reach the threshold, the last candidate is
        kept (reference falls out of its while-loop the same way)."""
        import jax
        import jax.numpy as jnp
        from open3d_ml_tpu.models.point_rcnn import aug_roi_by_noise

        rng = np.random.default_rng(2)
        gt = self._boxes(rng, 8)
        rois = gt.copy()
        rois[:, 0] += 50.0  # nowhere near the gt
        iou_src = np.zeros(8, np.float32)
        out_rois, out_iou = aug_roi_by_noise(
            jnp.asarray(rois), jnp.asarray(gt), jnp.asarray(iou_src),
            jax.random.PRNGKey(2), pos_thresh=0.55, aug_times=4)
        out_iou = np.asarray(out_iou)
        assert (out_iou < 0.55).all()
        assert np.isfinite(np.asarray(out_rois)).all()
