"""Throughput sweep of fused-path (seg, qblock, S) configs on the chip.

Mirrors bench.py's bench_randlanet measurement (chained fori_loop, single
scalar fetch) but parameterizes the fused-bucket config so the accuracy
frontier from scripts/accuracy_study.py can be joined with points/sec on
real hardware. Prints one JSON line per config.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_cfg(seg, block, num_segs, gather_segs=0, up_segs=0,
              gather_qblock=0, up_mode="search", iters=20):
    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.models import RandLANet

    batch_size = 4
    num_points = 45056
    model = RandLANet(num_points=num_points, num_classes=19,
                      ignored_label_inds=[0], in_channels=3, dim_features=8,
                      dim_output=[16, 64, 128, 256],
                      sub_sampling_ratio=[4, 4, 4, 4],
                      seg=seg, block=block, num_segs=num_segs,
                      gather_segs=gather_segs, up_segs=up_segs,
                      gather_qblock=gather_qblock, up_mode=up_mode)
    net = model.get_net()
    rng = np.random.default_rng(0)
    batch = {
        "coords": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
        "features": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b: net.init({"params": key, "dropout": key}, b,
                           training=False))(batch)

    def fwd(v, b):
        return jnp.sum(net.apply(v, b, training=False))

    @jax.jit
    def run(v, b):
        def body(_, s):
            bb = {k2: x + s * 1e-38 for k2, x in b.items()}
            return fwd(v, bb)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(variables, batch))
    t0 = time.perf_counter()
    float(run(variables, batch))
    dt = time.perf_counter() - t0
    return batch_size * num_points * iters / dt


def main():
    import jax

    from open3d_ml_tpu.pipelines.base_pipeline import _enable_compile_cache
    _enable_compile_cache()
    # a literal D element anywhere = up_mode='derive' (searchless upsample)
    raw = [a.split(",") for a in sys.argv[1:]]
    cfgs = [(tuple(int(x) for x in parts if x != "D"),
             "derive" if "D" in parts else "search")
            for parts in raw] or [
        ((128, 128, 8), "search"), ((64, 128, 48), "search"),
        ((64, 128, 64), "search"), ((128, 128, 32), "search")]
    print(json.dumps({"device": jax.devices()[0].device_kind}))
    for cfg, um in cfgs:
        seg, block, s = cfg[:3]
        g, u, gq = (list(cfg[3:]) + [0, 0, 0])[:3]
        try:
            pps = bench_cfg(seg, block, s, g, u, gq, um)
            print(json.dumps({"seg": seg, "qblock": block, "S": s,
                              "G": g, "U": u, "GQ": gq,
                              "up_mode": um,
                              "points_per_sec": round(pps, 1),
                              "vs_1M": round(pps / 1e6, 3)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"seg": seg, "qblock": block, "S": s, "G": g,
                              "GQ": gq,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
