"""Loss + scheduler unit tests against torch reference numerics
(reference ml3d/torch/modules/)."""

import numpy as np

import jax
import jax.numpy as jnp


class TestFocalLoss:

    def test_matches_torch_formula(self):
        import torch
        from open3d_ml_tpu.modules.losses import FocalLoss

        rng = np.random.default_rng(0)
        pred = rng.standard_normal((32, 3)).astype(np.float32)
        target = rng.integers(0, 3, 32)
        onehot = np.eye(3, dtype=np.float32)[target]

        loss = FocalLoss(gamma=2.0, alpha=0.25)
        ours = float(loss(jnp.asarray(pred), jnp.asarray(onehot),
                          avg_factor=32))

        # independent torch computation of the sigmoid focal loss
        p = torch.sigmoid(torch.tensor(pred))
        t = torch.tensor(onehot)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(pred), t, reduction="none")
        pt = p * t + (1 - p) * (1 - t)
        alpha_t = 0.25 * t + 0.75 * (1 - t)
        expected = float((alpha_t * (1 - pt) ** 2 * ce).sum() / 32)
        np.testing.assert_allclose(ours, expected, rtol=1e-5)


class TestSmoothL1:

    def test_matches_torch(self):
        import torch
        from open3d_ml_tpu.modules.losses import SmoothL1Loss

        rng = np.random.default_rng(1)
        pred = rng.standard_normal((20, 7)).astype(np.float32)
        target = rng.standard_normal((20, 7)).astype(np.float32)
        ours = float(SmoothL1Loss(beta=1.0 / 9.0)(jnp.asarray(pred),
                                                  jnp.asarray(target)))
        expected = float(torch.nn.functional.smooth_l1_loss(
            torch.tensor(pred), torch.tensor(target), beta=1.0 / 9.0,
            reduction="sum") / 20)
        np.testing.assert_allclose(ours, expected, rtol=2e-3)


class TestFilterValidLabel:

    def test_masking_and_remap(self):
        from open3d_ml_tpu.modules.losses import filter_valid_label

        scores = jnp.asarray(np.random.default_rng(2).standard_normal(
            (6, 3)).astype(np.float32))
        labels = jnp.asarray([0, 1, 2, 3, 0, 2])
        # ignore raw label 0; remaining labels shift down by 1
        l, mask = filter_valid_label(scores, labels, 3, [0])
        l = np.asarray(l)
        mask = np.asarray(mask)
        assert mask.tolist() == [False, True, True, True, False, True]
        np.testing.assert_array_equal(l[mask], [0, 1, 2, 1])


class TestSchedulers:

    def test_exponential(self):
        from open3d_ml_tpu.modules.schedulers import exponential_lr
        sched = exponential_lr(1.0, gamma=0.5, steps_per_epoch=2)
        np.testing.assert_allclose(float(sched(0)), 1.0)
        np.testing.assert_allclose(float(sched(2)), 0.5)
        np.testing.assert_allclose(float(sched(4)), 0.25)

    def test_cosine_warmup(self):
        from open3d_ml_tpu.modules.schedulers import cosine_warmup_lr
        sched = cosine_warmup_lr(1.0, total_steps=100, warmup_steps=10)
        assert float(sched(0)) < 0.2
        np.testing.assert_allclose(float(sched(10)), 1.0, atol=0.1)
        assert float(sched(99)) < 0.1

    def test_one_cycle(self):
        from open3d_ml_tpu.modules.schedulers import one_cycle_lr
        sched = one_cycle_lr(1.0, total_steps=100)
        peak = max(float(sched(s)) for s in range(100))
        np.testing.assert_allclose(peak, 1.0, atol=0.05)
        assert float(sched(0)) < float(sched(40))

    def test_bn_momentum(self):
        from open3d_ml_tpu.modules.schedulers import bn_momentum_schedule
        sched = bn_momentum_schedule(bn_momentum=0.5, bn_decay=0.5,
                                     decay_step=10)
        np.testing.assert_allclose(sched(0), 0.5)
        np.testing.assert_allclose(sched(10), 0.25)
