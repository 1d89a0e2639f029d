"""Multi-host (2-process) jax.distributed test.

Exercises the framework's real multi-host path end-to-end in two CPU
subprocesses — jax.distributed.initialize, a global ("data","model") mesh
spanning both processes, data_parallel_jit with per-process local batch
shards, and process_allgather — the single-controller replacement for the
reference's mp.spawn + DDP + dist.gather_object machinery
(/root/reference/scripts/run_pipeline.py:195-260,
ml3d/torch/pipelines/object_detection.py:222-233). See _multihost_worker.py
for the driven code.
"""

import os
import socket
import subprocess
import sys
from os.path import dirname, join

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_dp_step():
    worker = join(dirname(__file__), "_multihost_worker.py")
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", coord],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "OK" in out, out[-2000:]

    def field(out, tag):
        return [ln for ln in out.splitlines() if ln.startswith(tag)][0]

    # both processes compute the same global loss (grads all-reduced over
    # the full 8-device mesh) and see the same gathered metric
    assert field(outs[0], "LOSS") == field(outs[1], "LOSS")
    assert field(outs[0], "GATHER") == field(outs[1], "GATHER") \
        == "GATHER [1.0, 2.0]"
