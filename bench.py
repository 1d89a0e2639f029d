"""Benchmark: flagship-model inference throughput on one TPU chip.

Primary metric: RandLA-Net SemanticKITTI-config inference (num_points=45056,
batch 4) in points/sec — INCLUDING the on-device KNN/pool/upsample pyramid
(which the reference computes on the CPU in DataLoader workers; here it is
part of the XLA program). Secondary metric (extra field in the same JSON
line): PointPillars KITTI-config scans/sec (voxelize -> PFN -> BEV scatter ->
SECOND/FPN -> head, on-device end to end).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Never tracebacks: on persistent backend failure it prints the JSON line with
an "error" field and exits 0, so a transient TPU-relay blip cannot erase the
round's record.

Baseline: the reference publishes no throughput numbers (SURVEY.md section
6). We use 1.0e6 points/sec as the reference-CUDA estimate for RandLA-Net
inference on a single modern GPU (45k-point patch in ~45 ms); the BASELINE
target is >=3x that per chip, i.e. vs_baseline >= 3.0. For PointPillars the
anchor is 50 scans/sec (~20 ms/scan on a modern GPU for the KITTI config).
"""

import json
import time
import traceback

import numpy as np

REFERENCE_POINTS_PER_SEC = 1.0e6
REFERENCE_PP_SCANS_PER_SEC = 50.0


def _probe_devices(retries=6, delay=5.0):
    """Probe the backend with retry/backoff; a relay blip at t=0 must not
    kill the run. Returns the device list (raises after all retries)."""
    import os

    import jax
    try:
        # persistent compile cache: the train-step compile is minutes cold,
        # seconds warm — this is what makes the train metric affordable in
        # the default record (same mechanism as parallel/dryrun.py)
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    last = None
    for attempt in range(retries):
        try:
            devs = jax.devices()
            # force one tiny dispatch so a half-up relay fails here, inside
            # the retry loop, instead of at the first real array build
            import jax.numpy as jnp
            float(jnp.zeros(()) + 1.0)
            return devs
        except Exception as e:  # noqa: BLE001 - any backend error retries
            last = e
            time.sleep(delay * (1.5 ** attempt))
    raise RuntimeError(f"no usable jax backend after {retries} probes: "
                       f"{last}")


def bench_randlanet():
    """RandLA-Net inference points/sec at the SemanticKITTI patch size."""
    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.models import RandLANet

    batch_size = 4
    num_points = 45056
    model = RandLANet(num_points=num_points, num_classes=19,
                      ignored_label_inds=[0], in_channels=3, dim_features=8,
                      dim_output=[16, 64, 128, 256],
                      sub_sampling_ratio=[4, 4, 4, 4])
    net = model.get_net()

    rng = np.random.default_rng(0)
    batch = {
        "coords": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
        "features": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    # jit the init: eager init dispatches hundreds of small programs
    variables = jax.jit(
        lambda b: net.init({"params": key, "dropout": key}, b,
                           training=False))(batch)

    # Throughput measurement: chain the iterations by a data dependency
    # inside ONE jitted fori_loop and fetch a single scalar at the end.
    # This amortizes the host->device dispatch round-trip (measured ~32 ms
    # through the TPU relay) exactly the way pipelined production serving
    # does; per-iteration fetches would measure the relay, not the chip.
    # (block_until_ready alone does not reliably force execution here, so
    # the final scalar fetch is the sync point.)
    iters = 20

    def fwd(v, b):
        return jnp.sum(net.apply(v, b, training=False))

    @jax.jit
    def run(v, b):
        def body(_, s):
            bb = {k2: x + s * 1e-38 for k2, x in b.items()}
            return fwd(v, bb)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(variables, batch))  # warmup + compile
    t0 = time.perf_counter()
    float(run(variables, batch))
    dt = time.perf_counter() - t0

    from open3d_ml_tpu.utils.flops import (peak_flops_for,
                                           randlanet_forward_flops)
    flops_fwd = randlanet_forward_flops(
        num_points, num_neighbors=16, dim_output=(16, 64, 128, 256),
        dim_features=8, in_channels=3, sub_sampling_ratio=(4, 4, 4, 4),
        num_classes=19, batch_size=batch_size)
    peak = peak_flops_for(jax.devices()[0].device_kind)
    mfu = flops_fwd * iters / dt / peak
    return batch_size * num_points * iters / dt, flops_fwd, mfu


def bench_randlanet_train():
    """RandLA-Net TRAIN-step points/sec (forward + grads + adam, chained).

    The reference flow being measured: semantic_segmentation.py:403-437
    (forward/loss/backward/step), here as one jitted step with the
    on-device pyramid shared by value_and_grad.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from open3d_ml_tpu.models import RandLANet

    batch_size = 4
    num_points = 45056
    model = RandLANet(num_points=num_points, num_classes=19,
                      ignored_label_inds=[0], in_channels=3, dim_features=8,
                      dim_output=[16, 64, 128, 256],
                      sub_sampling_ratio=[4, 4, 4, 4])
    net = model.get_net()

    rng = np.random.default_rng(0)
    batch = {
        "coords": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
        "features": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
        "labels": jnp.asarray(
            rng.integers(1, 19, (batch_size, num_points)), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b: net.init({"params": key, "dropout": key}, b,
                           training=True))(batch)
    params = variables["params"]
    bs0 = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt0 = tx.init(params)

    def loss_fn(p, bstats, b):
        out, upd = net.apply({"params": p, "batch_stats": bstats}, b,
                             training=True, mutable=["batch_stats"],
                             rngs={"dropout": key})
        logits = out.reshape(-1, 19)
        labels = b["labels"].reshape(-1)
        lp = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                 labels[:, None], -1)[:, 0]
        return -jnp.mean(lp), upd["batch_stats"]

    iters = 10

    @jax.jit
    def run(p, bstats, opt, b):
        def body(_, st):
            p, bstats, opt = st
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bstats, b)
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), new_bs, opt
        p, bstats, opt = jax.lax.fori_loop(0, iters, body, (p, bstats, opt))
        return jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))

    float(run(params, bs0, opt0, batch))  # warmup + compile
    t0 = time.perf_counter()
    float(run(params, bs0, opt0, batch))
    dt = time.perf_counter() - t0
    return batch_size * num_points * iters / dt


def bench_pointpillars():
    """PointPillars KITTI-config scans/sec (end-to-end on-device forward).

    Reference flow being measured: voxelize -> PillarFeatureNet -> BEV
    scatter -> SECOND -> SECONDFPN -> Anchor3DHead
    (/root/reference/ml3d/torch/models/point_pillars.py:130-134).
    """
    import os

    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.models import PointPillars
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "open3d_ml_tpu", "configs",
                            "pointpillars_kitti.yml")
    cfg = Config.load_from_file(cfg_path)
    model_cfg = dict(cfg.model)
    model_cfg.pop("name", None)
    model = PointPillars(**model_cfg)
    net = model.get_net(training=False)

    batch_size = 4
    num_points = 20000  # typical KITTI scan size after range filtering
    rng = np.random.default_rng(0)
    pts = np.zeros((batch_size, model.cfg.max_points, 4), np.float32)
    pr = model.point_cloud_range
    pts[:, :num_points, 0] = rng.uniform(pr[0], pr[3],
                                         (batch_size, num_points))
    pts[:, :num_points, 1] = rng.uniform(pr[1], pr[4],
                                         (batch_size, num_points))
    pts[:, :num_points, 2] = rng.uniform(pr[2], pr[5],
                                         (batch_size, num_points))
    pts[:, :num_points, 3] = rng.uniform(0, 1, (batch_size, num_points))
    batch = {
        "point": jnp.asarray(pts),
        "point_count": jnp.full((batch_size,), num_points, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b: net.init({"params": key}, b, training=False))(batch)

    # chained-dispatch throughput (see bench_randlanet for rationale)
    iters = 20

    @jax.jit
    def run(v, b):
        def body(_, s):
            bb = dict(b)
            bb["point"] = b["point"] + s * 1e-38
            outs = net.apply(v, bb, training=False)
            return sum(jnp.sum(o) for o in jax.tree.leaves(outs))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(variables, batch))  # warmup + compile
    t0 = time.perf_counter()
    float(run(variables, batch))
    dt = time.perf_counter() - t0

    from open3d_ml_tpu.utils.flops import (peak_flops_for,
                                           pointpillars_forward_flops)
    head = dict(model_cfg.get("head", {}))
    sizes = head.get("sizes", [[1.6, 3.9, 1.56]])
    rotations = head.get("rotations", [0, 1.5707963])
    flops_fwd = pointpillars_forward_flops(
        max_points=model.cfg.max_points,
        feat_channels=tuple(
            dict(model_cfg.get("voxel_encoder", {})).get(
                "feat_channels", [64])),
        output_shape=tuple(
            dict(model_cfg.get("scatter", {})).get(
                "output_shape", [496, 432])),
        backbone=dict(model_cfg.get("backbone", {})),
        neck=dict(model_cfg.get("neck", {})),
        num_classes=len(model_cfg.get("classes", ["Car", "Ped", "Cyc"])),
        num_anchors=len(np.asarray(sizes).reshape(-1, 3)) * len(rotations),
        batch_size=batch_size)
    peak = peak_flops_for(jax.devices()[0].device_kind)
    mfu = flops_fwd * iters / dt / peak
    return batch_size * iters / dt, flops_fwd, mfu


def _chained_throughput(apply_fn, variables, batch, rows_per_iter,
                        iters=10):
    """Time `iters` chained forwards inside one jit (see bench_randlanet
    for why) and return rows/sec."""
    import time

    import jax
    import jax.numpy as jnp

    def bump(b, s):
        out = dict(b)
        for k, v in out.items():
            if isinstance(v, list):
                out[k] = [x + s * 1e-38 if jnp.issubdtype(
                    x.dtype, jnp.floating) else x for x in v]
            elif jnp.issubdtype(v.dtype, jnp.floating):
                out[k] = v + s * 1e-38
        return out

    @jax.jit
    def run(v, b):
        def body(_, s):
            outs = apply_fn(v, bump(b, s))
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(outs))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(variables, batch))  # warmup + compile
    t0 = time.perf_counter()
    float(run(variables, batch))
    dt = time.perf_counter() - t0
    return rows_per_iter * iters / dt


def _lidar_cloud(n, seed=0, r_max=50.0):
    rng = np.random.default_rng(seed)
    r = 2.0 * (r_max / 2.0) ** rng.uniform(0, 1, n)
    th = rng.uniform(0, 2 * np.pi, n)
    return np.stack([r * np.cos(th), r * np.sin(th),
                     rng.uniform(-2, 1, n)], 1).astype(np.float32)


def bench_kpconv():
    """KPFCNN SemanticKITTI-config on-device forward points/sec.

    The radius-neighbor pyramid is host-built in dataloader workers
    (exactly where the reference builds it, concat_batcher.py:186-370)
    and pipelined with device steps, so the metric times the device
    program: the KPConv gather/kernel-correlation stack over a 16,384-pt
    patch. Anchor: ~0.3M pts/s (KPConv paper reports ~100 ms forwards for
    ~15k-pt batches on a GTX 1080Ti; doubled for a modern GPU).
    """
    import os

    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.dataloaders import DefaultBatcher
    from open3d_ml_tpu.datasets.samplers import SemSegRandomSampler
    from open3d_ml_tpu.models import KPFCNN
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "open3d_ml_tpu", "configs",
                            "kpconv_semantickitti.yml")
    cfg = Config.load_from_file(cfg_path)
    model_cfg = dict(cfg.model)
    model_cfg.pop("name", None)
    model = KPFCNN(**model_cfg)

    data = {"point": _lidar_cloud(120000), "feat": None,
            "label": np.zeros(120000, np.int32)}
    pre = model.preprocess(data, {"split": "test"})
    model.trans_point_sampler = SemSegRandomSampler.get_point_sampler()
    t = model.transform(pre, {"split": "test"})
    batch = DefaultBatcher().collate_fn(
        [{"data": t, "attr": {}}])["data"]
    batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                 [jnp.asarray(x) for x in v]) for k, v in batch.items()
             if k != "labels" and not k.startswith("point_inds")}

    net = model.get_net()
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b: net.init({"params": key}, b, training=False))(batch)
    pps = _chained_throughput(
        lambda v, b: net.apply(v, b, training=False), variables, batch,
        rows_per_iter=model.cfg.num_points)
    return pps


def bench_sparseconvunet():
    """SparseConvUnet ScanNet-config on-device forward points/sec.

    Whole program on device: voxel hash + rulebook construction + 7-level
    submanifold U-Net + devoxelize, 65,536-pt / 40k-voxel scene. Anchor:
    ~1.0M pts/s (TorchSparse-class runtimes: a ~100k-pt ScanNet scene in
    ~100 ms on a modern GPU).
    """
    import os

    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.models import SparseConvUnet
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "open3d_ml_tpu", "configs",
                            "sparseconvunet_scannet.yml")
    cfg = Config.load_from_file(cfg_path)
    model_cfg = dict(cfg.model)
    model_cfg.pop("name", None)
    model = SparseConvUnet(**model_cfg)
    n = model.cfg.num_points

    rng = np.random.default_rng(0)
    # indoor-scene-like cloud in voxel units (preprocess scale 1/0.02,
    # snapped to voxel centers) — ~8m x 8m x 3m room
    pts = np.stack([rng.uniform(0, 400, n), rng.uniform(0, 400, n),
                    rng.uniform(0, 150, n)], 1)
    pts = (pts.astype(np.int32) + 0.5).astype(np.float32)
    batch = {
        "point": jnp.asarray(pts[None]),
        "feat": jnp.asarray(rng.uniform(-1, 1, (1, n, 3)), jnp.float32),
        "point_mask": jnp.ones((1, n), bool),
    }
    net = model.get_net()
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b: net.init({"params": key}, b, training=False))(batch)
    return _chained_throughput(
        lambda v, b: net.apply(v, b, training=False), variables, batch,
        rows_per_iter=n, iters=5)


def bench_pointtransformer():
    """PointTransformer S3DIS-config on-device forward points/sec.

    Whole program on device: FPS transition-downs, KNN vector
    self-attention, trilinear transition-ups over a 16,384-pt room patch,
    batch 2. Anchor: ~0.3M pts/s (the reference vector-attention
    implementation runs S3DIS rooms at hundreds of ms on a modern GPU).
    """
    import os

    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.models import PointTransformer
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "open3d_ml_tpu", "configs",
                            "pointtransformer_s3dis.yml")
    cfg = Config.load_from_file(cfg_path)
    model_cfg = dict(cfg.model)
    model_cfg.pop("name", None)
    model = PointTransformer(**model_cfg)
    n = model.cfg.num_points
    b = 2

    rng = np.random.default_rng(0)
    batch = {
        "point": jnp.asarray(rng.uniform(0, 8, (b, n, 3)), jnp.float32),
        "feat": jnp.asarray(rng.uniform(0, 1, (b, n, 3)), jnp.float32),
    }
    net = model.get_net()
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda bb: net.init({"params": key}, bb, training=False))(batch)
    return _chained_throughput(
        lambda v, bb: net.apply(v, bb, training=False), variables, batch,
        rows_per_iter=b * n, iters=5)


REFERENCE_KPCONV_PPS = 3.0e5
REFERENCE_SCU_PPS = 1.0e6
REFERENCE_PT_PPS = 3.0e5


def main():
    record = {
        "metric": "randlanet_inference_points_per_sec",
        "value": 0.0,
        "unit": "points/sec/chip",
        "vs_baseline": 0.0,
    }
    try:
        devs = _probe_devices()
        record["device_kind"] = getattr(devs[0], "device_kind", "unknown")
        pps, flops_fwd, mfu = bench_randlanet()
        record["value"] = round(pps, 1)
        record["vs_baseline"] = round(pps / REFERENCE_POINTS_PER_SEC, 3)
        record["model_flops_per_fwd"] = round(flops_fwd)
        record["mfu"] = round(mfu, 5)
    except Exception:  # noqa: BLE001 - record, never traceback
        record["error"] = traceback.format_exc(limit=3)[-800:]
        print(json.dumps(record))
        return

    try:
        sps, pp_flops, pp_mfu = bench_pointpillars()
        record["pointpillars_scans_per_sec"] = round(sps, 2)
        record["pointpillars_vs_baseline"] = round(
            sps / REFERENCE_PP_SCANS_PER_SEC, 3)
        record["pointpillars_mfu"] = round(pp_mfu, 5)
    except Exception:  # noqa: BLE001 - secondary metric must not kill run
        record["pointpillars_error"] = traceback.format_exc(limit=2)[-400:]

    # secondary-config throughputs (BASELINE.json names these configs);
    # each records independently and must not kill the run. BENCH_QUICK=1
    # skips them (and the train metric) for fast iteration.
    import os
    if not os.environ.get("BENCH_QUICK"):
        for field, anchor, fn in (
                ("kpconv_points_per_sec", REFERENCE_KPCONV_PPS,
                 bench_kpconv),
                ("sparseconvunet_points_per_sec", REFERENCE_SCU_PPS,
                 bench_sparseconvunet),
                ("pointtransformer_points_per_sec", REFERENCE_PT_PPS,
                 bench_pointtransformer)):
            try:
                pps = fn()
                record[field] = round(pps, 1)
                record[field.replace("_points_per_sec", "_vs_baseline")] = \
                    round(pps / anchor, 3)
            except Exception:  # noqa: BLE001
                record[field + "_error"] = \
                    traceback.format_exc(limit=2)[-300:]

    # train throughput is part of the default record (VERDICT r2 #4); the
    # multi-minute cold compile is bounded by the persistent compile cache
    # set up in _probe_devices. BENCH_NO_TRAIN=1 skips it for quick runs.
    if not os.environ.get("BENCH_NO_TRAIN") and \
            not os.environ.get("BENCH_QUICK"):
        try:
            tps = bench_randlanet_train()
            record["randlanet_train_points_per_sec"] = round(tps, 1)
        except Exception:  # noqa: BLE001 - must not kill the run
            record["train_error"] = traceback.format_exc(limit=2)[-400:]

    print(json.dumps(record))


if __name__ == "__main__":
    main()
