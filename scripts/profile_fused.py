"""Time the fused RandLA-Net forward's pieces on the chip.

Splits the forward into (a) pyramid build (Morton sort + segment selection
+ Pallas KNN at all levels) and (b) everything else (the network's gather
matmuls + MLPs), by timing the pyramid alone and the full forward with the
same chained-fori_loop methodology as bench.py.
"""
import json
import sys
import time

import numpy as np


def chained(fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(_, s):
            aa = (a[0] + s * 1e-38,) + a[1:]
            return fn(*aa)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    import os

    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    seg, qblock, num_segs = (int(x) for x in (sys.argv[1:4] or [128, 128, 32]))
    from open3d_ml_tpu.models import RandLANet
    from open3d_ml_tpu.ops.bucket import build_bucket_pyramid_tpu

    b, n = 4, 45056
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-25, 25, (b, n, 3)), jnp.float32)

    def pyr(p):
        out = build_bucket_pyramid_tpu(p, 16, [4, 4, 4, 4], seg=seg,
                                       qblock=qblock, num_segs=num_segs)
        acc = jnp.float32(0.0)
        for lst in (out["nbr_rel"], out["pool_rel"], out["up_rel"]):
            for x in lst:
                acc += jnp.sum(x.astype(jnp.float32)) * 1e-12
        return acc

    t_pyr = chained(pyr, pts)
    print(json.dumps({"stage": "pyramid", "seg": seg, "qblock": qblock,
                      "S": num_segs, "ms": round(t_pyr * 1e3, 2)}),
          flush=True)

    model = RandLANet(num_points=n, num_classes=19, ignored_label_inds=[0],
                      in_channels=3, dim_features=8,
                      dim_output=[16, 64, 128, 256],
                      sub_sampling_ratio=[4, 4, 4, 4],
                      seg=seg, block=qblock, num_segs=num_segs)
    net = model.get_net()
    batch = {"coords": pts,
             "features": jnp.asarray(
                 rng.uniform(-25, 25, (b, n, 3)), jnp.float32)}
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda bb: net.init(
        {"params": key, "dropout": key}, bb, training=False))(batch)

    def fwd(c, v, f):
        return jnp.sum(net.apply(v, {"coords": c, "features": f},
                                 training=False))

    t_fwd = chained(fwd, pts, variables, batch["features"])
    print(json.dumps({"stage": "forward", "seg": seg, "qblock": qblock,
                      "S": num_segs, "ms": round(t_fwd * 1e3, 2),
                      "model_ms": round((t_fwd - t_pyr) * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
