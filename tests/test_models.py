"""Model forward-shape + loss tests (reference test strategy, SURVEY.md §4:
config -> model -> random cloud -> forward shapes, plus gradient checks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open3d_ml_tpu.models import RandLANet


@pytest.fixture(scope="module")
def randlanet_small():
    # 2 pyramid levels + jitted init: the 4-level fixture with eager init
    # cost ~70s of CPU compile per module run (fast-suite budget)
    model = RandLANet(num_points=512, num_classes=7, ignored_label_inds=[0],
                      in_channels=3, dim_features=8, num_layers=2,
                      dim_output=[16, 32],
                      sub_sampling_ratio=[4, 4])
    net = model.get_net()
    rng = np.random.default_rng(0)
    batch = {
        "coords": jnp.asarray(rng.standard_normal((2, 512, 3)), jnp.float32),
        "features": jnp.asarray(rng.standard_normal((2, 512, 3)),
                                jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 7, (2, 512)), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b: net.init({"params": key, "dropout": key}, b,
                           training=False))(batch)
    return model, net, batch, variables


class TestRandLANet:

    def test_forward_shape(self, randlanet_small):
        model, net, batch, variables = randlanet_small
        out = net.apply(variables, batch, training=False)
        assert out.shape == (2, 512, 7)
        assert bool(jnp.isfinite(out).all())

    def test_train_mode_updates_batch_stats(self, randlanet_small):
        model, net, batch, variables = randlanet_small
        key = jax.random.PRNGKey(1)
        out, updates = net.apply(variables, batch, training=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": key})
        assert out.shape == (2, 512, 7)
        old = jax.tree.leaves(variables["batch_stats"])
        new = jax.tree.leaves(updates["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(old, new))
        assert changed

    @pytest.mark.slow
    def test_loss_and_grads_finite(self, randlanet_small):
        model, net, batch, variables = randlanet_small

        class _Loss:
            class_weights = None

            @staticmethod
            def weighted_cross_entropy(logits, labels, valid):
                logp = jnp.take_along_axis(
                    jax.nn.log_softmax(logits, axis=-1), labels[:, None],
                    axis=-1)[:, 0]
                w = valid.astype(jnp.float32)
                return -(logp * w).sum() / jnp.maximum(w.sum(), 1e-6)

        def loss_fn(params):
            out = net.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                batch, training=False)
            loss, _, _ = model.get_loss(_Loss, out, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        for g in jax.tree.leaves(grads):
            assert bool(jnp.isfinite(g).all())

    def test_ignored_labels_masked(self, randlanet_small):
        model, net, batch, variables = randlanet_small
        from open3d_ml_tpu.modules.losses import filter_valid_label
        labels = jnp.asarray([0, 1, 2, 0, 6], jnp.int32)
        remapped, valid = filter_valid_label(None, labels, 7, [0])
        np.testing.assert_array_equal(np.asarray(valid),
                                      [False, True, True, False, True])
        np.testing.assert_array_equal(np.asarray(remapped)[[1, 2, 4]],
                                      [0, 1, 5])

    def test_transform_outputs_fixed_shape(self):
        model = RandLANet(num_points=256, num_classes=7,
                          ignored_label_inds=[0], in_channels=3,
                          grid_size=0.5,
                          dim_output=[16, 32, 64, 128],
                          sub_sampling_ratio=[4, 4, 4, 4])
        rng = np.random.default_rng(0)
        data = {
            "point": rng.uniform(0, 10, (5000, 3)).astype(np.float32),
            "feat": None,
            "label": rng.integers(0, 7, 5000).astype(np.int32),
        }
        pre = model.preprocess(data, {"split": "training"})
        assert "search_tree" in pre
        from open3d_ml_tpu.datasets.samplers import SemSegRandomSampler
        model.trans_point_sampler = SemSegRandomSampler.get_point_sampler()
        out = model.transform(pre, {"split": "training"})
        assert out["coords"].shape == (256, 3)
        assert out["features"].shape == (256, 3)
        assert out["labels"].shape == (256,)


@pytest.mark.slow
class TestCompiledModel:
    """AOT wrapper (models/compiled_model.py), the OpenVINO-backend analog
    (reference openvino_model.py:17-143)."""

    def test_compile_cache_and_delegation(self):
        import jax
        import jax.numpy as jnp
        from open3d_ml_tpu.models import CompiledModel, RandLANet

        model = RandLANet(num_points=256, num_classes=5,
                          ignored_label_inds=[], in_channels=3,
                          dim_features=8, dim_output=[16, 32],
                          sub_sampling_ratio=[4, 4], num_layers=2)
        net = model.get_net()
        rng = np.random.default_rng(0)
        batch = {
            "coords": jnp.asarray(rng.standard_normal((1, 256, 3)),
                                  jnp.float32),
            "features": jnp.asarray(rng.standard_normal((1, 256, 3)),
                                    jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        variables = jax.jit(
            lambda b: net.init({"params": key, "dropout": key}, b,
                               training=False))(batch)
        wrapped = CompiledModel(model, variables)
        out1 = wrapped(batch)
        assert out1.shape == (1, 256, 5)
        assert len(wrapped._compiled) == 1
        out2 = wrapped.forward(batch)  # same signature -> cache hit
        assert len(wrapped._compiled) == 1
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
        # attribute passthrough to the wrapped model
        assert wrapped.cfg is model.cfg
        assert wrapped.name == model.name


@pytest.mark.slow
class TestRandLANetWindowKNN:
    """RandLA-Net end to end with the Morton-window neighbor method."""

    def test_forward_window_method(self):
        import jax
        import jax.numpy as jnp
        from open3d_ml_tpu.models import RandLANet

        model = RandLANet(num_points=1024, num_classes=5,
                          ignored_label_inds=[], in_channels=3,
                          dim_features=8, dim_output=[16, 32],
                          sub_sampling_ratio=[4, 4], num_layers=2,
                          knn_method="window")
        net = model.get_net()
        rng = np.random.default_rng(0)
        batch = {
            "coords": jnp.asarray(rng.uniform(0, 20, (2, 1024, 3)),
                                  jnp.float32),
            "features": jnp.asarray(rng.standard_normal((2, 1024, 3)),
                                    jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        v = jax.jit(lambda b: net.init({"params": key, "dropout": key}, b,
                                       training=False))(batch)
        out = jax.jit(lambda v, b: net.apply(v, b, training=False))(v,
                                                                    batch)
        assert out.shape == (2, 1024, 5)
        assert bool(jnp.isfinite(out).all())
