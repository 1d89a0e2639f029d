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
    # Shared with the pipelines and bench.py (OPEN3D_ML_TPU_COMPILE_CACHE
    # overrides the location).
    from ..pipelines.base_pipeline import _enable_compile_cache
    _enable_compile_cache()

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


def dryrun_objdet_step(n_devices):
    """One PointPillars DP train step on an n-device mesh (tiny canvas).

    The reference's actual DDP use case is object detection
    (/root/reference/ml3d/torch/pipelines/object_detection.py:302-344);
    this validates the mesh-sharded analog: batch sharded on "data",
    params/opt replicated, XLA gradient all-reduce — through the full
    voxelize -> PFN -> BEV scatter -> SECOND/FPN -> head -> anchor-assign
    -> focal/smooth-L1/dir losses program. Returns the (finite) loss.
    """
    from ..models import PointPillars

    from ..pipelines.base_pipeline import _enable_compile_cache
    _enable_compile_cache()

    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.asarray(devices), axis_names=("data",))
    bsh = NamedSharding(mesh, P("data"))
    rsh = NamedSharding(mesh, P())

    pc_range = [0.0, -6.4, -3.0, 12.8, 6.4, 1.0]
    model = PointPillars(
        point_cloud_range=pc_range,
        classes=["Pedestrian", "Car"],
        voxelize={"max_num_points": 8, "voxel_size": [0.4, 0.4, 4],
                  "max_voxels": [128, 128]},
        voxel_encoder={"in_channels": 4, "feat_channels": [16],
                       "voxel_size": [0.4, 0.4, 4]},
        scatter={"in_channels": 16, "output_shape": [32, 32]},
        backbone={"in_channels": 16, "out_channels": [16, 32],
                  "layer_nums": [1, 1], "layer_strides": [2, 2]},
        neck={"in_channels": [16, 32], "out_channels": [16, 16],
              "upsample_strides": [1, 2]},
        head={"ranges": [pc_range, pc_range],
              "sizes": [[0.6, 0.8, 1.73], [1.6, 3.9, 1.56]],
              "rotations": [0, 1.5707963],
              "iou_thr": [[0.35, 0.5], [0.45, 0.6]]},
        max_points=256, max_gt=4)
    net = model.get_net(training=True)

    rng = np.random.default_rng(0)
    b = max(n_devices, 2)
    pts = np.zeros((b, 256, 4), np.float32)
    n_real = 200
    pts[:, :n_real, 0] = rng.uniform(pc_range[0], pc_range[3], (b, n_real))
    pts[:, :n_real, 1] = rng.uniform(pc_range[1], pc_range[4], (b, n_real))
    pts[:, :n_real, 2] = rng.uniform(pc_range[2], pc_range[5], (b, n_real))
    boxes = np.zeros((b, 4, 7), np.float32)
    boxes[:, :2, :3] = rng.uniform(1, 6, (b, 2, 3))
    boxes[:, :2, 2] = -1.0
    boxes[:, :2, 3:6] = [[0.6, 0.8, 1.73]]
    labels = np.zeros((b, 4), np.int32)
    batch = {
        "point": jnp.asarray(pts),
        "point_count": jnp.full((b,), n_real, jnp.int32),
        "bboxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels),
        "bbox_count": jnp.full((b,), 2, jnp.int32),
    }
    batch = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)

    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda bb: net.init({"params": key}, bb, training=False))(batch)
    params = jax.device_put(variables["params"], rsh)
    batch_stats = jax.device_put(variables.get("batch_stats", {}), rsh)
    tx = optax.adam(1e-3)
    opt_state = jax.device_put(tx.init(params), rsh)

    def train_step(params, batch_stats, opt_state, batch, rng_key):
        def loss_fn(p):
            results, updates = net.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                training=True, mutable=["batch_stats"],
                rngs={"dropout": rng_key,
                      "sampling": jax.random.fold_in(rng_key, 1)})
            losses = model.get_loss(results, batch)
            return sum(losses.values()), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    jitted = jax.jit(train_step)
    _, _, _, loss = jitted(params, batch_stats, opt_state, batch, key)
    loss = float(loss)
    assert np.isfinite(loss), f"objdet dryrun loss not finite: {loss}"
    return loss
