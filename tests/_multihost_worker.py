"""Worker for the 2-process jax.distributed test (run via subprocess).

Drives the framework's real multi-host path — jax.distributed.initialize,
make_mesh over the GLOBAL device set, a data-parallel train step through
data_parallel_jit, and process_allgather for metric collection — the
single-controller replacement for the reference's mp.spawn + DDP +
dist.gather_object flow (run_pipeline.py:195-260,
object_detection.py:222-233).

Usage: python _multihost_worker.py <process_id> <num_processes> <coord>
Prints "LOSS <v>" and "GATHER <list>" which the test asserts equal across
processes.
"""

import os
import sys

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from open3d_ml_tpu.parallel import (data_parallel_jit, make_mesh,  # noqa
                                    process_allgather, shard_batch)

assert jax.process_count() == nproc
mesh = make_mesh()  # all 2*4 = 8 global devices, pure DP
assert mesh.devices.size == 4 * nproc

w = jnp.ones((8, 4)) * 0.1
# per-process local batch half; deterministic contents so the global loss
# is process-count invariant
rows = np.arange(128).reshape(16, 8).astype(np.float32) / 128.0
local = rows[pid * 8:(pid + 1) * 8]


def step(params, batch):
    pred = batch @ params
    loss = jnp.mean(pred ** 2)
    grad = jax.grad(lambda p: jnp.mean((batch @ p) ** 2))(params)
    return loss, params - 0.1 * grad


fn = data_parallel_jit(step, mesh, batch_argnums=(1,))
gbatch = shard_batch(jnp.asarray(local), mesh)
loss, new_w = fn(w, gbatch)
print(f"LOSS {float(loss):.6f}", flush=True)

g = process_allgather(jnp.asarray([float(pid) + 1.0]))
print(f"GATHER {np.asarray(g).ravel().tolist()}", flush=True)
print("OK", flush=True)
