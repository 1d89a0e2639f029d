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


@pytest.mark.slow
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


@pytest.mark.slow
class TestDeformable:
    """Deformable KPConv: offsets, p2p fitting regularizer, deform lr.

    Reference machinery being replaced: kpconv.py:1005-1105 (deformable
    offsets), :2167-2209 (p2p_fitting_regularizer), kpconv get_optimizer
    :293-314 + kpconv_semantickitti.yml:85 (deform_lr_factor).
    """

    def _deform_model(self):
        from open3d_ml_tpu.models import KPFCNN
        return KPFCNN(num_classes=6, lbl_values=list(range(7)),
                      ignored_label_inds=[0], num_points=256,
                      first_features_dim=16, in_features_dim=2,
                      first_subsampling_dl=0.2, in_radius=3.0,
                      neighborhood_limits=[10, 10],
                      deform_fitting_power=1.0, repulse_extent=1.2,
                      architecture=[
                          "simple", "resnetb_deformable",
                          "resnetb_deformable_strided", "resnetb",
                          "nearest_upsample", "unary"
                      ])

    def _batch(self, model):
        rng = np.random.default_rng(0)
        data = {
            "point": rng.uniform(0, 6, (1500, 3)).astype(np.float32),
            "feat": None,
            "label": rng.integers(0, 7, 1500).astype(np.int32),
        }
        pre = model.preprocess(data, {"split": "training"})
        from open3d_ml_tpu.datasets.samplers import SemSegRandomSampler
        model.trans_point_sampler = SemSegRandomSampler.get_point_sampler()
        sample = model.transform(pre, {"split": "training"},
                                 rng=np.random.default_rng(1))
        return jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], 0),
            sample, sample)  # batch of 2

    def test_deformable_forward_and_regularizer(self):
        model = self._deform_model()
        batch = self._batch(model)
        net = model.get_net()
        key = jax.random.PRNGKey(0)
        variables = net.init({"params": key}, batch, training=False)
        # offset params exist
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        names = ["/".join(str(k) for k in p) for p, _ in flat]
        assert any("offset_conv" in n for n in names)
        assert any("offset_bias" in n for n in names)

        out, aux = net.apply(variables, batch, training=True,
                             mutable=["batch_stats", "p2p_reg"],
                             rngs={"dropout": key})
        assert jnp.all(jnp.isfinite(out))
        reg = model.regularizer_loss(aux)
        val = float(reg)
        assert np.isfinite(val) and val > 0.0  # fitting term is positive

    def test_deformable_train_step_decreases_nothing_nan(self):
        import optax
        model = self._deform_model()
        batch = self._batch(model)
        net = model.get_net()
        key = jax.random.PRNGKey(0)
        variables = net.init({"params": key}, batch, training=False)

        class _PipeCfg(dict):
            optimizer = {"lr": 0.01, "momentum": 0.9}
            def get(self, k, d=None):
                return {"scheduler_gamma": 1.0, "steps_per_epoch": 1,
                        "deform_lr_factor": 0.1}.get(k, d)

        tx, _ = model.get_optimizer(_PipeCfg())
        opt_state = tx.init(variables["params"])

        class _L:
            class_weights = None
            @staticmethod
            def weighted_cross_entropy(lg, lb, vm):
                logp = jnp.take_along_axis(
                    jax.nn.log_softmax(lg, -1), lb[:, None], -1)[:, 0]
                w = vm.astype(jnp.float32)
                return -(logp * w).sum() / jnp.maximum(w.sum(), 1e-6)

        def loss_fn(params):
            out, aux = net.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                batch, training=True,
                mutable=["batch_stats", "p2p_reg"],
                rngs={"dropout": key})
            loss, _, _ = model.get_loss(_L, out, batch)
            return loss + model.regularizer_loss(aux)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        # offsets receive gradient through the regularizer + conv
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        off = [float(jnp.abs(v).sum()) for p, v in flat
               if "offset" in "/".join(str(k) for k in p)]
        assert off and sum(off) > 0.0
        updates, _ = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        leaf = jax.tree.leaves(new_params)[0]
        assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_deform_lr_factor_scales_update(self):
        import optax
        model = self._deform_model()
        params = {
            "enc1": {"KPConv": {"offset_bias": jnp.ones((6,)),
                                "weights": jnp.ones((3, 2, 2))}},
        }

        class _PipeCfg(dict):
            optimizer = {"lr": 1.0, "momentum": 0.0}
            def get(self, k, d=None):
                return {"scheduler_gamma": 1.0, "steps_per_epoch": 1,
                        "deform_lr_factor": 0.1}.get(k, d)

        tx, _ = model.get_optimizer(_PipeCfg())
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        off = updates["enc1"]["KPConv"]["offset_bias"]
        base = updates["enc1"]["KPConv"]["weights"]
        # offset update is 10x smaller than the base update
        np.testing.assert_allclose(np.asarray(off) * 10,
                                   np.asarray(base)[0, 0, 0], rtol=1e-5)
