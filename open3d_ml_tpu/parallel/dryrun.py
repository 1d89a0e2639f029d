"""Multi-chip dry-run: compile + execute one full DP training step on a mesh.

Used by __graft_entry__.dryrun_multichip to validate that the framework's
sharded training path compiles and runs on an n-device mesh (virtual CPU
devices in CI, real chips in production). Exercises the same code path as
SemanticSegmentation._make_train_step: batch sharded on the mesh "data" axis,
params/optimizer replicated, XLA-inserted gradient all-reduce, cross-sample
BatchNorm stats sync (axis_name="batch" inside nn.vmap).
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dryrun_train_step(n_devices, num_points=256, num_classes=8,
                      model_parallel=None):
    """Build an n-device mesh, jit the full RandLA-Net train step over it,
    run ONE step on tiny shapes. Returns the (finite) loss as a float.

    With >= 4 devices the mesh is 2-D (data x model): the batch shards on
    "data" and every Dense kernel's output axis shards on "model" (tensor
    parallelism), so the dry run exercises both mesh axes and the XLA
    collectives between them.
    """
    from ..models import RandLANet

    # Persistent compilation cache: the dryrun is compile-dominated on the
    # virtual CPU mesh; repeat runs on the same machine become near-instant.
    try:
        import os
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "..", "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if model_parallel is None:
        model_parallel = 2 if n_devices >= 4 and n_devices % 2 == 0 else 1
    dp = n_devices // model_parallel
    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.asarray(devices).reshape(dp, model_parallel),
                axis_names=("data", "model"))
    bsh = NamedSharding(mesh, P("data"))
    rsh = NamedSharding(mesh, P())

    def param_sharding(path, x):
        """Tensor-shard Dense kernels on the model axis when divisible."""
        if (model_parallel > 1 and x.ndim == 2 and
                x.shape[-1] % model_parallel == 0):
            return NamedSharding(mesh, P(None, "model"))
        return rsh

    # 2 encoder/decoder stages (not the production 4): the dryrun validates
    # the mesh shardings and collectives, and compile time on the forced-CPU
    # virtual mesh scales with graph depth. Shardings/collectives are
    # identical per stage, so 2 stages exercise the same program structure.
    model = RandLANet(num_points=num_points, num_classes=num_classes,
                      ignored_label_inds=[0], in_channels=3, dim_features=8,
                      num_layers=2, dim_output=[16, 32],
                      sub_sampling_ratio=[4, 4])
    net = model.get_net()

    rng = np.random.default_rng(0)
    batch_size = max(n_devices, 2)
    batch = {
        "coords": jnp.asarray(
            rng.standard_normal((batch_size, num_points, 3)), jnp.float32),
        "features": jnp.asarray(
            rng.standard_normal((batch_size, num_points, 3)), jnp.float32),
        "labels": jnp.asarray(
            rng.integers(0, num_classes, (batch_size, num_points)),
            jnp.int32),
    }
    batch = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)

    key = jax.random.PRNGKey(0)
    # jit the init: eager init dispatches hundreds of small programs, which
    # dominates wall time on the forced-CPU virtual mesh.
    variables = jax.jit(
        lambda b: net.init({"params": key, "dropout": key}, b,
                           training=False))(batch)
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, param_sharding(path, x)),
        variables["params"])
    batch_stats = jax.device_put(variables["batch_stats"], rsh)
    tx = optax.adam(1e-3)
    opt_state = jax.device_put(tx.init(params), rsh)

    class _Loss:
        class_weights = None

        @staticmethod
        def weighted_cross_entropy(logits, labels, valid):
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), labels[:, None],
                axis=-1)[:, 0]
            w = valid.astype(jnp.float32)
            return -(logp * w).sum() / jnp.maximum(w.sum(), 1e-6)

    def train_step(params, batch_stats, opt_state, batch, dropout_key):
        def loss_fn(p):
            results, updates = net.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                training=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_key})
            loss, _, _ = model.get_loss(_Loss, results, batch)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, loss

    # shardings come from the committed placements of the inputs; XLA
    # propagates them through the step and inserts the collectives
    jitted = jax.jit(train_step)
    new_params, new_bs, new_opt, loss = jitted(
        params, batch_stats, opt_state, batch, key)
    loss = float(loss)
    assert np.isfinite(loss), f"dryrun loss not finite: {loss}"
    return loss
