"""KPFCNN tests: kernel points, host pyramid, forward, loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _small_model():
    from open3d_ml_tpu.models import KPFCNN
    return KPFCNN(num_classes=6, lbl_values=list(range(7)),
                  ignored_label_inds=[0], num_points=512,
                  first_features_dim=32, in_features_dim=2,
                  first_subsampling_dl=0.2, in_radius=3.0,
                  neighborhood_limits=[12, 12, 12],
                  architecture=[
                      "simple", "resnetb", "resnetb_strided", "resnetb",
                      "resnetb_strided", "resnetb", "nearest_upsample",
                      "unary", "nearest_upsample", "unary"
                  ])


class TestKernelPoints:

    def test_lloyd_properties(self):
        from open3d_ml_tpu.models.kpconv import kernel_point_lloyd
        kp = kernel_point_lloyd(0.15, 15)
        assert kp.shape == (15, 3)
        np.testing.assert_allclose(kp[0], 0, atol=1e-6)  # fixed center
        norms = np.linalg.norm(kp[1:], axis=1)
        assert (norms > 0).all() and (norms <= 0.15 + 1e-5).all()
        # deterministic
        kp2 = kernel_point_lloyd(0.15, 15)
        np.testing.assert_array_equal(kp, kp2)


class TestKPFCNN:

    @pytest.fixture(scope="class")
    def pipeline_batch(self):
        model = _small_model()
        rng = np.random.default_rng(0)
        data = {
            "point": rng.uniform(0, 8, (4000, 3)).astype(np.float32),
            "feat": None,
            "label": rng.integers(0, 7, 4000).astype(np.int32),
        }
        pre = model.preprocess(data, {"split": "training"})
        from open3d_ml_tpu.datasets.samplers import SemSegRandomSampler
        model.trans_point_sampler = SemSegRandomSampler.get_point_sampler()
        t = model.transform(pre, {"split": "training"})
        from open3d_ml_tpu.dataloaders import DefaultBatcher
        batch = DefaultBatcher().collate_fn(
            [{"data": t, "attr": {}}, {"data": t, "attr": {}}])["data"]
        return model, batch

    def test_pyramid_shapes(self, pipeline_batch):
        model, batch = pipeline_batch
        assert len(batch["points"]) == 3  # 2 strided -> 3 levels
        assert batch["points"][0].shape[1] == model.cfg.num_points
        assert len(batch["neighbors"]) == 3
        assert len(batch["pools"]) == 2
        assert len(batch["upsamples"]) == 2

    def test_forward_and_loss(self, pipeline_batch):
        model, batch = pipeline_batch
        batch = {
            k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                [jnp.asarray(x) for x in v]) for k, v in batch.items()
        }
        net = model.get_net()
        key = jax.random.PRNGKey(0)
        v = net.init({"params": key}, batch, training=False)
        out = net.apply(v, batch, training=False)
        assert out.shape == (2, 512, 6)
        assert bool(jnp.isfinite(out).all())

        class _L:
            class_weights = None

            @staticmethod
            def weighted_cross_entropy(lg, lb, vm):
                lp = jnp.take_along_axis(jax.nn.log_softmax(lg, -1),
                                         lb[:, None], -1)[:, 0]
                w = vm.astype(jnp.float32)
                return -(lp * w).sum() / jnp.maximum(w.sum(), 1e-6)

        loss, _, _ = model.get_loss(_L, out, batch)
        assert np.isfinite(float(loss))
