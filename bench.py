"""Benchmark: flagship-model inference throughput on one TPU chip.

Primary metric: RandLA-Net inference points/sec, built from the SHIPPED
config (`open3d_ml_tpu/configs/randlanet_semantickitti.yml` — num_points,
batch size, and the fused-KNN table budget all come from that file), so the
benched configuration can never silently diverge from what `RandLANet()`
users run. The measurement INCLUDES the on-device KNN/pool/upsample pyramid
(which the reference computes on the CPU in DataLoader workers; here it is
part of the XLA program). Secondary metrics: PointPillars scans/sec,
KPConv / SparseConvUnet / PointTransformer points/sec, and the RandLA-Net
train-step points/sec + MFU.

Hang-proof by construction: the parent process never imports JAX. Every
metric (and the initial backend probe) runs in its own subprocess under a
hard wall-clock watchdog, so a hung TPU relay — which blocks `jax.devices()`
forever rather than raising — costs one timeout, not the round's artifact.
After every completed metric the parent prints the CUMULATIVE record as one
flushed JSON line and rewrites `BENCH_partial.json`; kill -9 at any moment
leaves every completed metric on stdout (the driver parses the last JSON
line).

Flap-proof, not just hang-proof (round 4 measured the TPU relay going down
for ~15 minutes and then RECOVERING): the probe retries with sleeps up to a
total budget (default 25 min) instead of treating the first timeout as
fatal, and after two consecutive metric timeouts the parent re-probes (same
retry budget) and, if the backend answers again, retries the two timed-out
metrics and resumes the rest — once per run — instead of bailing.

Env knobs: BENCH_QUICK=1 (primary + pointpillars only), BENCH_NO_TRAIN=1,
BENCH_METRICS=name,name (explicit subset), BENCH_PROBE_TIMEOUT /
BENCH_METRIC_TIMEOUT / BENCH_TRAIN_TIMEOUT (seconds), BENCH_PROBE_BUDGET /
BENCH_PROBE_RETRY_SLEEP (probe retry loop), BENCH_FLAP_RESCUES (re-probe +
resume cycles after consecutive metric timeouts, default 1).

Baseline: the reference publishes no throughput numbers (SURVEY.md section
6). We use 1.0e6 points/sec as the reference-CUDA estimate for RandLA-Net
inference on a single modern GPU (45k-point patch in ~45 ms); the BASELINE
target is >=3x that per chip, i.e. vs_baseline >= 3.0. For PointPillars the
anchor is 50 scans/sec (~20 ms/scan on a modern GPU for the KITTI config).
"""

import json
import os
import subprocess
import sys
import time
import traceback

REFERENCE_POINTS_PER_SEC = 1.0e6
REFERENCE_PP_SCANS_PER_SEC = 50.0
REFERENCE_KPCONV_PPS = 3.0e5
REFERENCE_SCU_PPS = 1.0e6
REFERENCE_PT_PPS = 3.0e5

_HERE = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------- children
# Everything below runs in per-metric subprocesses; only children import
# JAX / numpy / the framework.

def _setup_jax():
    """Child-side JAX setup: shared persistent compile cache (same helper
    and OPEN3D_ML_TPU_COMPILE_CACHE override as the pipelines and
    parallel/dryrun.py use, so bench runs reuse pipeline compiles).

    BENCH_FORCE_PLATFORM=cpu forces the backend (used by CPU smoke runs
    and the watchdog tests): the axon TPU plugin force-sets jax_platforms
    at sitecustomize time, so the JAX_PLATFORMS env var alone is not
    enough — the config must be updated after importing jax (same dance
    as tests/conftest.py).
    """
    forced = os.environ.get("BENCH_FORCE_PLATFORM")
    if forced:
        import jax
        jax.config.update("jax_platforms", forced)
    from open3d_ml_tpu.pipelines.base_pipeline import _enable_compile_cache
    _enable_compile_cache()


def _flagship_model(num_points_override=None):
    """Build RandLANet from the SHIPPED SemanticKITTI YAML.

    Returns (model, batch_size). The bench measuring anything other than
    the file users train from was round 2/3's three-way config
    fragmentation; loading the YAML here makes divergence impossible.
    """
    from open3d_ml_tpu.models import RandLANet
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(_HERE, "open3d_ml_tpu", "configs",
                            "randlanet_semantickitti.yml")
    cfg = Config.load_from_file(cfg_path)
    model_cfg = dict(cfg.model)
    model_cfg.pop("name", None)
    model_cfg.pop("ckpt_path", None)
    if num_points_override:
        model_cfg["num_points"] = num_points_override
    model = RandLANet(**model_cfg)
    return model, int(dict(cfg.pipeline or {}).get("batch_size", 4))


def _knn_config_string(cfg):
    """Human-readable fused-table budget, for the record."""
    if cfg.knn_method != "fused":
        return cfg.knn_method
    s = f"fused seg{cfg.seg} qb{cfg.block} S{cfg.num_segs}"
    if getattr(cfg, "gather_segs", 0):
        s += f" G{cfg.gather_segs}"
    if getattr(cfg, "gather_qblock", 0):
        s += f" GQ{cfg.gather_qblock}"
    if getattr(cfg, "up_segs", 0):
        s += f" U{cfg.up_segs}"
    if getattr(cfg, "up_mode", "search") == "derive":
        s += " D"
    if getattr(cfg, "infer_num_segs", 0) or getattr(cfg, "infer_gather_segs",
                                                    0):
        s += (f" infer:S{cfg.infer_num_segs or cfg.num_segs}"
              f"_G{cfg.infer_gather_segs or getattr(cfg, 'gather_segs', 0)}")
    return s


def _flap_once(tag):
    """Test hook shared by the fake-flap children: block forever on the
    FIRST call (leaving a state file in BENCH_FLAP_STATE), succeed on the
    second — the shape of a relay outage that recovers."""
    state_dir = os.environ.get("BENCH_FLAP_STATE")
    marker = os.path.join(state_dir, f"flapped_{tag}")
    if not os.path.exists(marker):
        open(marker, "w").close()
        time.sleep(3600)


def child_probe():
    """Backend probe: device discovery + one tiny dispatch. On a hung
    relay this BLOCKS (it does not raise), which is exactly why it runs
    in a watchdogged subprocess."""
    fake = os.environ.get("BENCH_FAKE_HANG", "")
    if fake == "probe":
        time.sleep(3600)  # test hook: simulate the hung-relay block
    if fake == "probe_flap":
        _flap_once("probe")  # test hook: hang once, then recover
    _setup_jax()
    import jax
    import jax.numpy as jnp
    devs = jax.devices()
    float(jnp.zeros(()) + 1.0)
    return {"device_kind": getattr(devs[0], "device_kind", "unknown"),
            "num_devices": len(devs)}


def child_randlanet():
    """RandLA-Net inference points/sec at the shipped SemanticKITTI
    config (patch size, batch size and fused-KNN budget from the YAML)."""
    _setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    model, batch_size = _flagship_model()
    num_points = model.cfg.num_points
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
    pps = batch_size * num_points * iters / dt

    from open3d_ml_tpu.utils.flops import (peak_flops_for,
                                           randlanet_forward_flops)
    flops_fwd = randlanet_forward_flops(
        num_points, num_neighbors=model.cfg.num_neighbors,
        dim_output=tuple(model.cfg.dim_output),
        dim_features=model.cfg.dim_features,
        in_channels=model.cfg.in_channels,
        sub_sampling_ratio=tuple(model.cfg.sub_sampling_ratio),
        num_classes=model.cfg.num_classes, batch_size=batch_size)
    peak = peak_flops_for(jax.devices()[0].device_kind)
    mfu = flops_fwd * iters / dt / peak
    return {"value": round(pps, 1),
            "vs_baseline": round(pps / REFERENCE_POINTS_PER_SEC, 3),
            "knn_config": _knn_config_string(model.cfg),
            "model_flops_per_fwd": round(flops_fwd),
            "mfu": round(mfu, 5)}


def child_train():
    """RandLA-Net TRAIN-step points/sec + MFU at the shipped config
    (forward + grads + adam, chained).

    The reference flow being measured: semantic_segmentation.py:403-437
    (forward/loss/backward/step), here as one jitted step with the
    on-device pyramid shared by value_and_grad.
    """
    _setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    model, batch_size = _flagship_model()
    num_points = model.cfg.num_points
    num_classes = model.cfg.num_classes
    net = model.get_net()

    rng = np.random.default_rng(0)
    batch = {
        "coords": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
        "features": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
        "labels": jnp.asarray(
            rng.integers(1, num_classes, (batch_size, num_points)),
            jnp.int32),
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
        logits = out.reshape(-1, num_classes)
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
    tps = batch_size * num_points * iters / dt

    from open3d_ml_tpu.utils.flops import (peak_flops_for,
                                           randlanet_forward_flops)
    # fwd + bwd ~= 3x forward FLOPs (standard rule: grads w.r.t. inputs
    # and weights each re-run the matmul volume once)
    flops_step = 3 * randlanet_forward_flops(
        num_points, num_neighbors=model.cfg.num_neighbors,
        dim_output=tuple(model.cfg.dim_output),
        dim_features=model.cfg.dim_features,
        in_channels=model.cfg.in_channels,
        sub_sampling_ratio=tuple(model.cfg.sub_sampling_ratio),
        num_classes=num_classes, batch_size=batch_size)
    peak = peak_flops_for(jax.devices()[0].device_kind)
    return {"randlanet_train_points_per_sec": round(tps, 1),
            "randlanet_train_mfu": round(flops_step * iters / dt / peak, 5)}


def child_pointpillars():
    """PointPillars KITTI-config scans/sec (end-to-end on-device forward).

    Reference flow being measured: voxelize -> PillarFeatureNet -> BEV
    scatter -> SECOND -> SECONDFPN -> Anchor3DHead
    (/root/reference/ml3d/torch/models/point_pillars.py:130-134).
    """
    _setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from open3d_ml_tpu.models import PointPillars
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(_HERE, "open3d_ml_tpu", "configs",
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

    # chained-dispatch throughput (see child_randlanet for rationale)
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
    sps = batch_size * iters / dt

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
    return {"pointpillars_scans_per_sec": round(sps, 2),
            "pointpillars_vs_baseline": round(
                sps / REFERENCE_PP_SCANS_PER_SEC, 3),
            "pointpillars_mfu": round(mfu, 5)}


def _chained_throughput(apply_fn, variables, batch, rows_per_iter,
                        iters=10):
    """Time `iters` chained forwards inside one jit (see child_randlanet
    for why) and return rows/sec."""
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
    import numpy as np
    rng = np.random.default_rng(seed)
    r = 2.0 * (r_max / 2.0) ** rng.uniform(0, 1, n)
    th = rng.uniform(0, 2 * np.pi, n)
    return np.stack([r * np.cos(th), r * np.sin(th),
                     rng.uniform(-2, 1, n)], 1).astype(np.float32)


def child_kpconv():
    """KPFCNN SemanticKITTI-config on-device forward points/sec.

    The radius-neighbor pyramid is host-built in dataloader workers
    (exactly where the reference builds it, concat_batcher.py:186-370)
    and pipelined with device steps, so the metric times the device
    program: the KPConv gather/kernel-correlation stack over a 16,384-pt
    patch. Anchor: ~0.3M pts/s (KPConv paper reports ~100 ms forwards for
    ~15k-pt batches on a GTX 1080Ti; doubled for a modern GPU).
    """
    _setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from open3d_ml_tpu.dataloaders import DefaultBatcher
    from open3d_ml_tpu.datasets.samplers import SemSegRandomSampler
    from open3d_ml_tpu.models import KPFCNN
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(_HERE, "open3d_ml_tpu", "configs",
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
    return {"kpconv_points_per_sec": round(pps, 1),
            "kpconv_vs_baseline": round(pps / REFERENCE_KPCONV_PPS, 3)}


def child_sparseconvunet():
    """SparseConvUnet ScanNet-config on-device forward points/sec.

    Whole program on device: voxel hash + rulebook construction + 7-level
    submanifold U-Net + devoxelize, 65,536-pt / 40k-voxel scene. Anchor:
    ~1.0M pts/s (TorchSparse-class runtimes: a ~100k-pt ScanNet scene in
    ~100 ms on a modern GPU).
    """
    _setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from open3d_ml_tpu.models import SparseConvUnet
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(_HERE, "open3d_ml_tpu", "configs",
                            "sparseconvunet_scannet.yml")
    cfg = Config.load_from_file(cfg_path)
    model_cfg = dict(cfg.model)
    model_cfg.pop("name", None)
    model = SparseConvUnet(**model_cfg)
    n = model.cfg.num_points

    rng = np.random.default_rng(0)
    # SURFACE-CONCENTRATED scene (r4 verdict Weak #6: the old uniform
    # scatter had ~0.3% occupancy and near-zero stencil connectivity,
    # which makes the number meaningless for ScanNet-like data): a
    # SyntheticShapes scene (ground plane + shells/sheets/wires), scaled
    # into voxel units and snapped to voxel centers exactly as
    # SparseConvUnet.preprocess does (models/sparseconvunet.py).
    from open3d_ml_tpu.datasets.synthetic import make_semseg_scene
    pts = make_semseg_scene(n, seed=0)[0].astype(np.float64)
    pts -= pts.min(0)
    pts *= min(1000.0 / max(pts.max(), 1e-6),
               1.0 / model.cfg.voxel_size)  # voxel units, extent < 1023
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
    pps = _chained_throughput(
        lambda v, b: net.apply(v, b, training=False), variables, batch,
        rows_per_iter=n, iters=5)
    return {"sparseconvunet_points_per_sec": round(pps, 1),
            "sparseconvunet_vs_baseline": round(pps / REFERENCE_SCU_PPS, 3)}


def child_pointtransformer():
    """PointTransformer S3DIS-config on-device forward points/sec.

    Whole program on device: FPS transition-downs, KNN vector
    self-attention, trilinear transition-ups over a 16,384-pt room patch,
    batch 2. Anchor: ~0.3M pts/s (the reference vector-attention
    implementation runs S3DIS rooms at hundreds of ms on a modern GPU).
    """
    _setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from open3d_ml_tpu.models import PointTransformer
    from open3d_ml_tpu.utils import Config

    cfg_path = os.path.join(_HERE, "open3d_ml_tpu", "configs",
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
    pps = _chained_throughput(
        lambda v, bb: net.apply(v, bb, training=False), variables, batch,
        rows_per_iter=b * n, iters=5)
    return {"pointtransformer_points_per_sec": round(pps, 1),
            "pointtransformer_vs_baseline": round(pps / REFERENCE_PT_PPS,
                                                  3)}


def child_stages():
    """Per-stage time breakdown of the flagship fused forward (r4 verdict
    Weak #4: MFU 0.32% says the chip is idle in matmul terms, but the
    FLOPs model cannot see WHERE the time goes — this can). Emits
    stage_{sort,select,knn,compact,pyramid,gather,model_rest}_ms for the
    shipped YAML config; see scripts/profile_stages.py for the method."""
    _setup_jax()
    sys.path.insert(0, os.path.join(_HERE, "scripts"))
    from profile_stages import stage_times

    model, batch_size = _flagship_model()
    cfg = model.cfg
    # profile the INFERENCE-phase budget — the one the randlanet metric
    # rides (training=False picks infer_num_segs/infer_gather_segs)
    st = stage_times(b=batch_size, n=cfg.num_points,
                     k=cfg.num_neighbors,
                     ratios=tuple(cfg.sub_sampling_ratio), seg=cfg.seg,
                     qblock=cfg.block,
                     num_segs=getattr(cfg, "infer_num_segs", 0) or
                     cfg.num_segs,
                     gather_segs=getattr(cfg, "infer_gather_segs", 0) or
                     cfg.gather_segs,
                     up_segs=getattr(cfg, "up_segs", 0),
                     up_mode=getattr(cfg, "up_mode", "search"), iters=5)
    return {f"stage_{k2}": v for k2, v in st.items()
            if k2.endswith("_ms")}


def child_selftest():
    """Instant no-JAX metric, used by tests of the watchdog machinery."""
    return {"selftest": 1}


def child_selfhang():
    """Deliberately blocks forever (simulates a hung TPU relay), used by
    tests of the watchdog machinery. Only reachable via BENCH_METRICS."""
    time.sleep(3600)
    return {}


def child_selfflap():
    """Hangs on its first invocation, succeeds on the second (simulates a
    metric caught in a relay flap that later recovers). Test-only."""
    _flap_once("a")
    return {"selfflap_a": 1}


def child_selfflap_b():
    """Second independent flapping metric (own state file)."""
    _flap_once("b")
    return {"selfflap_b": 1}


_CHILDREN = {
    "probe": child_probe,
    "randlanet": child_randlanet,
    "pointpillars": child_pointpillars,
    "kpconv": child_kpconv,
    "sparseconvunet": child_sparseconvunet,
    "pointtransformer": child_pointtransformer,
    "train": child_train,
    "stages": child_stages,
    "_selftest": child_selftest,
    "_selfhang": child_selfhang,
    "_selfflap_a": child_selfflap,
    "_selfflap_b": child_selfflap_b,
}


def _child_main(name):
    """Run one metric and print its fields as the last stdout line.
    Exceptions are recorded as `<name>_error`; the child still exits 0
    (the parent treats a missing JSON line as an error too)."""
    try:
        out = _CHILDREN[name]()
    except Exception:  # noqa: BLE001 - record, never traceback
        key = "error" if name == "probe" else f"{name}_error"
        out = {key: traceback.format_exc(limit=3)[-800:]}
    sys.stdout.flush()
    print("\n" + json.dumps(out), flush=True)


# ------------------------------------------------------------------ parent

def _run_child(name, timeout):
    """Run one metric subprocess under a wall-clock watchdog. Returns a
    dict of fields (possibly `<name>_error`). Never raises."""
    err_key = "error" if name == "probe" else f"{name}_error"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True, text=True, timeout=timeout, cwd=_HERE)
    except subprocess.TimeoutExpired:
        return {err_key: f"timed out after {timeout:.0f}s "
                         "(hung backend?)", "_timeout": True}
    except Exception:  # noqa: BLE001
        return {err_key: traceback.format_exc(limit=2)[-400:]}
    for line in reversed((proc.stdout or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    return {err_key: f"child rc={proc.returncode}, no JSON: "
                     f"{(proc.stderr or '')[-400:]}"}


def _emit(record):
    """Print the cumulative record as one flushed JSON line and mirror it
    to BENCH_partial.json — so a kill at ANY moment leaves every completed
    metric both on stdout and on disk."""
    print(json.dumps(record), flush=True)
    try:
        with open("BENCH_partial.json.tmp", "w") as f:
            json.dump(record, f, indent=1)
        os.replace("BENCH_partial.json.tmp", "BENCH_partial.json")
    except OSError:
        pass


def _probe_with_retries(record):
    """Probe the backend, retrying through relay flaps: sleep + re-probe
    until success or the total budget runs out. Round 4 measured a
    ~15-minute outage that then recovered, so the default budget is 25
    minutes with 130 s sleeps (the cadence that rescued the r4 suite).
    Mutates `record` (probe fields on success, error + attempt count on
    failure) and returns True iff the backend answered."""
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", 240))
    budget = float(os.environ.get("BENCH_PROBE_BUDGET", 1500))
    sleep_s = float(os.environ.get("BENCH_PROBE_RETRY_SLEEP", 130))
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        out = _run_child("probe", probe_timeout)
        out.pop("_timeout", None)
        record["probe_attempts"] = attempt
        if "error" not in out:
            record.pop("error", None)
            record.update(out)
            return True
        record["error"] = out["error"]
        if time.monotonic() - t0 + sleep_s + probe_timeout > budget:
            return False
        _emit(record)  # interim visibility while we wait out the flap
        time.sleep(sleep_s)


def main():
    record = {
        "metric": "randlanet_inference_points_per_sec",
        "value": 0.0,
        "unit": "points/sec/chip",
        "vs_baseline": 0.0,
    }
    metric_timeout = float(os.environ.get("BENCH_METRIC_TIMEOUT", 900))
    train_timeout = float(os.environ.get("BENCH_TRAIN_TIMEOUT", 1200))
    flap_rescues = int(os.environ.get("BENCH_FLAP_RESCUES", 1))

    if os.environ.get("BENCH_METRICS"):
        names = [n.strip() for n in
                 os.environ["BENCH_METRICS"].split(",") if n.strip()]
    elif os.environ.get("BENCH_QUICK"):
        names = ["randlanet", "pointpillars"]
    else:
        names = ["randlanet", "pointpillars", "kpconv", "sparseconvunet",
                 "pointtransformer"]
        if not os.environ.get("BENCH_NO_TRAIN"):
            names.append("train")
        names.append("stages")  # flagship per-stage breakdown (Weak #4)

    if not _probe_with_retries(record):
        _emit(record)
        return
    _emit(record)

    queue = list(names)
    consecutive_timeouts = 0
    i = 0
    while i < len(queue):
        name = queue[i]
        out = _run_child(
            name, train_timeout if name == "train" else metric_timeout)
        timed_out = out.pop("_timeout", False)
        if not timed_out and f"{name}_error" not in out:
            out.pop(f"{name}_error", None)
            record.pop(f"{name}_error", None)  # a retry succeeded
        record.update(out)
        _emit(record)
        consecutive_timeouts = consecutive_timeouts + 1 if timed_out else 0
        i += 1
        if consecutive_timeouts >= 2:
            # Two timeouts in a row: either the backend died, or (the
            # measured failure mode) the relay is mid-flap. Wait it out
            # with the probe-retry budget and, if it answers, retry the
            # two metrics the flap ate and resume the rest.
            if flap_rescues > 0 and _probe_with_retries(record):
                flap_rescues -= 1
                _emit(record)
                queue = queue[:i] + queue[i - 2:i] + queue[i:]
                consecutive_timeouts = 0
                continue
            record["error"] = ("two consecutive metric timeouts — "
                               "backend presumed dead, bailing with "
                               "partial record")
            _emit(record)
            return


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _child_main(sys.argv[2])
    else:
        main()
