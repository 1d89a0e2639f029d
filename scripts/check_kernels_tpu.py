"""On-chip sanity for the Pallas bucket kernels vs their XLA twins at
small-qblock configs (flattened one-hot paths), incl. pool-reuse gathers
at qblock/ratio block structure and the gather VJP."""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from open3d_ml_tpu.ops.bucket import select_segments, _pad_seg
    from open3d_ml_tpu.ops.pallas.bucket import (gather_pallas, knn_pallas,
                                                 _knn_xla)

    rng = np.random.default_rng(0)
    b, n, k = 2, 2048, 16
    seg, qblock, s = 64, 32, 12
    pts = np.sort(rng.uniform(-10, 10, (b, n, 3)).astype(np.float32), axis=1)
    pc = jnp.asarray(pts)
    pcp = _pad_seg(pc, seg, fill=1e9)
    sids = select_segments(pc, pc, seg=seg, qblock=qblock, num_segs=s)

    rel_t, d2_t = knn_pallas(pcp, pc, sids, k, seg=seg, qblock=qblock)
    rel_x, d2_x = _knn_xla(pcp, pc, sids, k, seg, qblock)
    md = float(jnp.max(jnp.abs(d2_t - d2_x)))
    agree = float((rel_t == rel_x).mean())
    print(f"knn qb32: max|d2 diff|={md:.2e} idx agree={agree:.4f}")
    assert md < 1e-3, md

    vals = jnp.asarray(rng.normal(0, 1, (b, n, 24)).astype(np.float32))
    vp = _pad_seg(vals, seg)
    g_t = gather_pallas(vp, sids, rel_t, seg, qblock, jnp.float32)
    g_x = gather_pallas(vp, sids, rel_t, seg, qblock, jnp.float32, True)
    md = float(jnp.max(jnp.abs(g_t - g_x)))
    print(f"gather flat qb32 f32: max diff={md:.2e}")
    assert md < 1e-5, md

    # pool-reuse structure: 8 queries per fine-block table
    prel = rel_t[:, ::4]
    gp_t = gather_pallas(vp, sids, prel, seg, 8, jnp.float32)
    gp_x = gather_pallas(vp, sids, prel, seg, 8, jnp.float32, True)
    md = float(jnp.max(jnp.abs(gp_t - gp_x)))
    print(f"gather pool qb8 f32: max diff={md:.2e}")
    assert md < 1e-5, md

    # VJP through the flattened backward
    def loss_t(v):
        return jnp.sum(gather_pallas(v, sids, rel_t, seg, qblock,
                                     jnp.float32) ** 2)

    def loss_x(v):
        return jnp.sum(gather_pallas(v, sids, rel_t, seg, qblock,
                                     jnp.float32, True) ** 2)

    gt = jax.grad(loss_t)(vp)
    gx = jax.grad(loss_x)(vp)
    md = float(jnp.max(jnp.abs(gt - gx)))
    print(f"gather bwd flat qb32: max grad diff={md:.2e}")
    assert md < 1e-3, md
    print("ALL KERNEL CHECKS OK")


if __name__ == "__main__":
    main()
