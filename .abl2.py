import time
import numpy as np
import jax, jax.numpy as jnp
from open3d_ml_tpu.ops.bucket import build_bucket_pyramid_tpu

B, N, k = 4, 45056, 16
rng = np.random.default_rng(0)
coords = jnp.asarray(rng.uniform(-25,25,(B,N,3)), jnp.float32)

def t(fn, *a, iters=5, label=''):
    r = fn(*a)
    leaf = jax.tree.leaves(r)[0]; float(jnp.sum(leaf.astype(jnp.float32)))
    t0=time.perf_counter()
    for _ in range(iters):
        r = fn(*a); leaf = jax.tree.leaves(r)[0]; float(jnp.sum(leaf.astype(jnp.float32)))
    print(f'{label}: {(time.perf_counter()-t0)/iters*1000:.1f} ms (incl ~32ms RT)', flush=True)

pyr_fn = jax.jit(lambda c: build_bucket_pyramid_tpu(c, k, [4,4,4,4], seg=128, qblock=128, num_segs=16))
t(pyr_fn, coords, label='fused pyramid (S=16)')
pyr_fn8 = jax.jit(lambda c: build_bucket_pyramid_tpu(c, k, [4,4,4,4], seg=128, qblock=128, num_segs=8))
t(pyr_fn8, coords, label='fused pyramid (S=8)')

# net body with pyramid precomputed: time full fused minus pyramid indirectly
from open3d_ml_tpu.models import RandLANet
model = RandLANet(num_points=N, num_classes=19, ignored_label_inds=[0], in_channels=3,
                  dim_features=8, dim_output=[16,64,128,256], sub_sampling_ratio=[4,4,4,4],
                  knn_method='fused', seg=128, block=128, num_segs=16)
net = model.get_net()
batch = {'coords': coords, 'features': coords}
key = jax.random.PRNGKey(0)
v = jax.jit(lambda b: net.init({'params': key, 'dropout': key}, b, training=False))(batch)
fwd = jax.jit(lambda v, b: jnp.sum(net.apply(v, b, training=False)))
float(fwd(v, batch))
t(lambda v, b: fwd(v, b), v, batch, label='full fused fwd (S=16)')
