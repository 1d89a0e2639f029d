"""Multi-device (8 virtual CPU) sharding tests."""

import numpy as np

import jax


class TestMesh:

    def test_make_mesh_all_devices(self):
        from open3d_ml_tpu.parallel import make_mesh
        mesh = make_mesh()
        assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
        assert mesh.axis_names == ("data", "model")

    def test_shard_batch(self):
        from open3d_ml_tpu.parallel import make_mesh, shard_batch
        mesh = make_mesh()
        n = len(jax.devices())
        batch = {"x": np.ones((n * 2, 16), np.float32)}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].shape == (n * 2, 16)
        # each device holds 2 rows
        assert len(sharded["x"].addressable_shards) == n


class TestDataParallelTrainStep:

    def test_dryrun_full_mesh(self):
        from open3d_ml_tpu.parallel.dryrun import dryrun_train_step
        n = len(jax.devices())
        loss = dryrun_train_step(n, num_points=256, num_classes=5)
        assert np.isfinite(loss)

    def test_dp_grads_match_single_device(self):
        """DP gradient all-reduce must reproduce single-device grads."""
        import jax.numpy as jnp
        import optax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        def loss_fn(w, x, y):
            pred = x @ w
            return jnp.mean((pred - y)**2)

        rng = np.random.default_rng(0)
        n = len(jax.devices())
        x = rng.standard_normal((n * 4, 8)).astype(np.float32)
        y = rng.standard_normal((n * 4, 3)).astype(np.float32)
        w = rng.standard_normal((8, 3)).astype(np.float32)

        g_single = jax.grad(loss_fn)(jnp.asarray(w), jnp.asarray(x),
                                     jnp.asarray(y))

        mesh = Mesh(np.asarray(jax.devices()).reshape(n, 1),
                    ("data", "model"))
        bsh = NamedSharding(mesh, P("data"))
        rsh = NamedSharding(mesh, P())
        g_dp = jax.jit(jax.grad(loss_fn),
                       in_shardings=(rsh, bsh, bsh))(
                           jax.device_put(jnp.asarray(w), rsh),
                           jax.device_put(jnp.asarray(x), bsh),
                           jax.device_put(jnp.asarray(y), bsh))
        np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_single),
                                   atol=1e-5)
