import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C, K = 45056, 128, 16
seg, qb, S = 128, 128, 8
nseg = N // seg; nqb = N // qb
table = S * seg

def kern(sref, rel_ref, *args):
    tabs, out_ref = args[:S], args[S]
    tab = jnp.concatenate([t[:] for t in tabs], 0).astype(jnp.bfloat16)
    rel = rel_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (qb, table), 1)
    for kk in range(K):
        oh = (iota == rel[:, kk][:, None]).astype(jnp.bfloat16)
        out = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
        out_ref[:, kk*C:(kk+1)*C] = out

def gather(values, sids, rel):
    specs = [pl.BlockSpec((seg, C), functools.partial(lambda b, sref, j: (sref[b, j], 0), j=j),
                          memory_space=pltpu.VMEM) for j in range(S)]
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nqb,),
            in_specs=[pl.BlockSpec((qb, K), lambda b, sref: (b, 0), memory_space=pltpu.VMEM)] + specs,
            out_specs=pl.BlockSpec((qb, K*C), lambda b, sref: (b, 0), memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((N, K*C), jnp.float32),
    )(sids, rel, *([values]*S))

rng = np.random.default_rng(0)
vals = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
sids = jnp.asarray(rng.integers(0, nseg, (nqb, S)), jnp.int32)
rel = jnp.asarray(rng.integers(0, table, (N, K)), jnp.int32)
print('compiling...', flush=True)
t0=time.time()
f = jax.jit(gather)
lowered = f.lower(vals, sids, rel)
print(f'lowered {time.time()-t0:.1f}s', flush=True)
t0=time.time()
comp = lowered.compile()
print(f'compiled {time.time()-t0:.1f}s', flush=True)
t0=time.time()
out = comp(vals, sids, rel)
s = float(jnp.sum(out))
print(f'first exec {time.time()-t0:.1f}s sum={s}', flush=True)
iters=10
t0=time.perf_counter()
for _ in range(iters): float(jnp.sum(f(vals, sids, rel)))
print(f'pallas gather [45k,16,128]: {(time.perf_counter()-t0)/iters*1000:.1f} ms (incl RT)', flush=True)
