import time, sys
import numpy as np
import jax, jax.numpy as jnp
from open3d_ml_tpu.ops.bucket import morton_sort, bucket_knn, gather_bucket, gather_bucket_max, build_bucket_pyramid

B, N, k = 4, 45056, 16
seg, qb, S = 128, 128, 16
rng = np.random.default_rng(0)
coords = jnp.asarray(rng.uniform(-25,25,(B,N,3)), jnp.float32)

def t(fn, *a, iters=5, label=''):
    r = fn(*a); jax.block_until_ready(r)
    # force with scalar fetch of first leaf
    leaf = jax.tree.leaves(r)[0]; float(jnp.sum(leaf.astype(jnp.float32)))
    t0=time.perf_counter()
    for _ in range(iters):
        r = fn(*a); leaf = jax.tree.leaves(r)[0]; float(jnp.sum(leaf.astype(jnp.float32)))
    print(f'{label}: {(time.perf_counter()-t0)/iters*1000:.1f} ms (incl ~32ms RT)', flush=True)

# 1. morton sort alone
t(jax.jit(jax.vmap(lambda c: morton_sort(c)[1])), coords, label='morton sort')
# 2. single-level self-knn at N=45056
sorted_c = jax.jit(jax.vmap(lambda c: morton_sort(c)[1]))(coords)
knn1 = jax.jit(jax.vmap(lambda c: bucket_knn(c, c, k, seg=seg, qblock=qb, num_segs=S)))
t(knn1, sorted_c, label='bucket_knn L0')
# 3. full pyramid
pyr_fn = jax.jit(jax.vmap(lambda c: build_bucket_pyramid(c, k, [4,4,4,4], seg=seg, qblock=qb, num_segs=S)))
t(pyr_fn, coords, label='full pyramid')
# 4. one gather_bucket at L0, C=11
sids, rel, _ = knn1(sorted_c)
vals = jnp.asarray(rng.standard_normal((B, N, 11)), jnp.float32)
g1 = jax.jit(jax.vmap(lambda v, s, r: gather_bucket(v, s, r, seg=seg, qblock=qb)))
t(g1, vals, sids, rel, label='gather_bucket [N,16,11]')
# 5. gather_bucket_max
gm = jax.jit(jax.vmap(lambda v, s, r: gather_bucket_max(v, s, r, seg=seg, qblock=qb)))
t(gm, vals, sids, rel, label='gather_bucket_max [N,16,11]')
