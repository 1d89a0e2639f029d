import time
import numpy as np
import jax, jax.numpy as jnp
from open3d_ml_tpu.ops.bucket import select_segments, _pad_seg
from open3d_ml_tpu.ops.pallas.bucket import knn_pallas, gather_pallas
from open3d_ml_tpu.ops.bucket import morton_sort

B, N, k = 4, 45056, 16
rng = np.random.default_rng(0)
coords = jnp.asarray(rng.uniform(-25,25,(B,N,3)), jnp.float32)
pc = jax.jit(jax.vmap(lambda c: morton_sort(c)[1]))(coords)

def t(fn, *a, iters=10, label=''):
    r = fn(*a); leaf = jax.tree.leaves(r)[0]; float(jnp.sum(leaf.astype(jnp.float32)))
    t0=time.perf_counter()
    for _ in range(iters):
        r = fn(*a); leaf = jax.tree.leaves(r)[0]; float(jnp.sum(leaf.astype(jnp.float32)))
    print(f'{label}: {(time.perf_counter()-t0)/iters*1000:.1f} ms (incl ~32ms RT)', flush=True)

for qb, S in [(128,12), (256,12), (512,12), (128,8)]:
    seg = 128
    sids = jax.jit(lambda p: select_segments(p, p, seg=seg, qblock=qb, num_segs=S))(pc)
    pcp = _pad_seg(pc, seg, fill=1e9)
    f = jax.jit(lambda pp, p, s: knn_pallas(pp, p, s, k, seg=seg, qblock=qb))
    t(f, pcp, pc, sids, label=f'knn L0 qb={qb} S={S}')
    rel, _ = f(pcp, pc, sids)
    vals = jnp.asarray(rng.standard_normal((B, N, 16)), jnp.float32)
    g = jax.jit(lambda v, s, r: gather_pallas(_pad_seg(v, seg), s, r, seg, qb, jnp.bfloat16, False))
    t(g, vals, sids, rel, label=f'gather C16 qb={qb} S={S}')
sel = jax.jit(lambda p: select_segments(p, p, seg=128, qblock=128, num_segs=12))
t(sel, pc, label='select_segments L0')
srt = jax.jit(jax.vmap(lambda c: morton_sort(c)[1]))
t(srt, coords, label='morton sort+permute')
