"""16-NN recall of bucket-KNN configs vs exact KD-tree on lidar-density
clouds, at production scale (45,056 points).

Runs the selection stage + the XLA twin of the Pallas table search on CPU
(identical semantics to the chip kernel up to distance ties), so configs can
be screened without touching the TPU. Prints one JSON line per config.
"""
import json
import sys

import numpy as np


def lidar_cloud(rng, n):
    """1/r radial density in a 50 m disc, like a spinning lidar scan."""
    r = 50.0 * rng.uniform(0.02, 1.0, n) ** 2
    th = rng.uniform(0, 2 * np.pi, n)
    z = rng.normal(0, 2.0, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from open3d_ml_tpu.ops.bucket import morton_sort, select_segments
    from open3d_ml_tpu.ops.pallas.bucket import _knn_xla

    n, k = 45056, 16
    rng = np.random.default_rng(0)
    pts = lidar_cloud(rng, n)
    _, pc = morton_sort(jnp.asarray(pts))
    pc = np.asarray(pc)
    exact = cKDTree(pc).query(pc, k=k)[1]

    cfgs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [
        (64, 32, 16), (128, 32, 8), (64, 64, 16), (64, 64, 24),
        (128, 64, 16), (64, 128, 64), (128, 128, 32), (128, 128, 8)]
    for seg, qblock, s in cfgs:
        pad = (-n) % seg
        pcp = jnp.pad(jnp.asarray(pc)[None], ((0, 0), (0, pad), (0, 0)),
                      constant_values=1e9)
        sids = select_segments(jnp.asarray(pc)[None], jnp.asarray(pc)[None],
                               seg=seg, qblock=qblock, num_segs=s)
        rel, _ = _knn_xla(pcp, jnp.asarray(pc)[None], sids, k, seg, qblock)
        blk = np.arange(n)[:, None] // qblock
        sid = np.asarray(sids)[0][blk, np.asarray(rel)[0] // seg]
        glob = sid * seg + np.asarray(rel)[0] % seg
        recall = float((glob[:, :, None] == exact[:, None, :]).any(1).mean())
        print(json.dumps({"seg": seg, "qblock": qblock, "S": s,
                          "table": seg * s, "recall": round(recall, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
