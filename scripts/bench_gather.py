"""Microbenchmark gather_pallas: where do the 37 ms of model gathers go?

Times one gather at level-0 shapes (Q=45056, k=16, B=4) across channel
widths, table widths and block granularities. Interpretation:
  * time flat in C        -> one-hot build / DMA bound (attack the k x
                             [qb, table] iota-compare construction)
  * time ~linear in C     -> matmul bound (attack table width)
  * time ~linear in table -> both matmul and build scale with table;
                             compare vs C-scaling to separate.
Usage: python scripts/bench_gather.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from open3d_ml_tpu.pipelines.base_pipeline import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.ops.pallas.bucket import gather_pallas

    b, q, k, seg = 4, 45056, 16, 64
    rng = np.random.default_rng(0)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "B": b, "Q": q, "k": k, "seg": seg}), flush=True)

    def run_case(qblock, s, c, dtype=jnp.bfloat16, iters=20):
        nqb = -(-q // qblock)
        nseg = 1024  # plenty of segments to pick from
        vals = jnp.asarray(rng.normal(size=(b, nseg * seg, c)), jnp.float32)
        seg_ids = jnp.asarray(
            rng.integers(0, nseg, (b, nqb, s)), jnp.int32)
        rel = jnp.asarray(rng.integers(0, s * seg, (b, q, k)), jnp.int32)

        @jax.jit
        def go(v):
            def body(_, acc):
                g = gather_pallas(v + acc * 1e-38, seg_ids, rel, seg,
                                  qblock, dtype)
                return jnp.sum(g.astype(jnp.float32)) * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(go(vals))
        t0 = time.perf_counter()
        float(go(vals))
        ms = (time.perf_counter() - t0) / iters * 1e3
        flops = b * q * k * s * seg * c * 2
        return ms, flops / (ms / 1e3)

    cases = [
        # C sweep at shipped table (G32 -> 2048), qb128
        (128, 32, 8), (128, 32, 16), (128, 32, 32), (128, 32, 64),
        (128, 32, 128),
        # table sweep at C=32
        (128, 16, 32), (128, 48, 32), (128, 64, 32),
        # block granularity at table 1024/2048, C=32
        (32, 16, 32), (32, 32, 32), (64, 16, 32), (64, 32, 32),
        # f32 reference at one point
    ]
    for qb, s, c in cases:
        try:
            ms, fps = run_case(qb, s, c)
            print(json.dumps({"qblock": qb, "S": s, "table": s * seg,
                              "C": c, "ms": round(ms, 3),
                              "tflops": round(fps / 1e12, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"qblock": qb, "S": s, "C": c,
                              "error": repr(e)[:160]}), flush=True)
    ms, fps = run_case(128, 32, 32, dtype=jnp.float32)
    print(json.dumps({"qblock": 128, "S": 32, "C": 32, "dtype": "f32",
                      "ms": round(ms, 3),
                      "tflops": round(fps / 1e12, 2)}), flush=True)


if __name__ == "__main__":
    main()
