"""PointRCNN / PointNet++ tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


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


class TestPointRCNN:

    @pytest.fixture(scope="class")
    def rpn_setup(self):
        from open3d_ml_tpu.models import PointRCNN
        model = PointRCNN(mode="RPN", npoints=1024,
                          rpn={"backbone": {"npoints": [256, 64, 16, 4]},
                               "head": {"nms_pre": 512, "nms_post": 64}})
        net = model.get_net()
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(-10, 10, (2, 1024, 3)), jnp.float32)
        key = jax.random.PRNGKey(0)
        v = net.init({"params": key, "dropout": key}, pts, training=False)
        return model, net, v, pts, rng

    def test_rpn_forward(self, rpn_setup):
        model, net, v, pts, rng = rpn_setup
        cls, reg, xyz, feats = net.apply(v, pts, training=False)
        assert cls.shape == (2, 1024, 1)
        assert reg.shape == (2, 1024, model.rpn_head_cfg.reg_channels)

    def test_proposal_layer(self, rpn_setup):
        model, net, v, pts, rng = rpn_setup
        cls, reg, xyz, feats = net.apply(v, pts, training=False)
        boxes, scores, valid = model.proposal_layer(cls[0][:, 0], reg[0],
                                                    xyz[0])
        assert boxes.shape == (64, 7)
        assert bool(jnp.isfinite(boxes[valid]).all())

    def test_rpn_loss(self, rpn_setup):
        model, net, v, pts, rng = rpn_setup
        cls, reg, xyz, feats = net.apply(v, pts, training=False)
        labels = jnp.asarray(rng.integers(-1, 2, (2, 1024)), jnp.int32)
        regs = jnp.asarray(rng.uniform(-1, 1, (2, 1024, 7)), jnp.float32)
        losses = model.rpn_loss({"cls": cls, "reg": reg},
                                {"labels": labels, "bboxes": regs})
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
