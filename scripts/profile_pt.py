"""Stage-level timing of the PointTransformer forward on the backend.

Times, separately jitted: full forward, FPS 16384->4096, exact KNN(16)
at each encoder scale, and a single Transformer block. One JSON line out.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from open3d_ml_tpu.pipelines.base_pipeline import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open3d_ml_tpu.ops.neighbors import knn_search
    from open3d_ml_tpu.ops.sampling import furthest_point_sampling

    rec = {"device": str(jax.devices()[0])}
    rng = np.random.default_rng(0)
    n = 16384
    pts = jnp.asarray(rng.uniform(0, 8, (n, 3)), jnp.float32)

    @jax.jit
    def fps(p):
        return furthest_point_sampling(p, n // 4)

    fps(pts)
    rec["fps_16k_to_4k_ms"] = timeit(fps, pts, iters=args.iters)

    for m in (16384, 4096, 1024):
        sub = pts[:m]

        @jax.jit
        def knn(p):
            return knn_search(p, p, 16)

        knn(sub)
        rec[f"exact_knn16_{m}_ms"] = timeit(knn, sub, iters=args.iters)

    # full model forward per bench config
    from open3d_ml_tpu.models import PointTransformer
    from open3d_ml_tpu.utils import Config
    cfg = Config.load_from_file(
        os.path.join(os.path.dirname(__file__), "..", "open3d_ml_tpu",
                     "configs", "pointtransformer_s3dis.yml"))
    model_cfg = dict(cfg.model)
    model_cfg.pop("name", None)
    model_cfg.pop("ckpt_path", None)
    model = PointTransformer(**model_cfg)
    net = model.get_net()
    np_ = model.cfg.num_points
    batch = {
        "point": jnp.asarray(rng.uniform(0, 8, (1, np_, 3)), jnp.float32),
        "feat": jnp.asarray(rng.uniform(0, 1, (1, np_, 3)), jnp.float32),
    }
    key0 = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b: net.init({"params": key0}, b, training=False))(batch)
    fwd = jax.jit(lambda v, b: net.apply(v, b, training=False))
    fwd(variables, batch)
    rec["full_forward_ms"] = timeit(fwd, variables, batch, iters=args.iters)
    rec["pts_per_sec"] = round(np_ / (rec["full_forward_ms"] / 1e3), 1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
