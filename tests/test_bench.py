"""Watchdog tests for bench.py's hang-proof orchestration.

Round 3's perf artifact was erased because the TPU relay hung:
`jax.devices()` on a dead relay BLOCKS (it does not raise), the old
bench printed its single JSON line only after ALL metrics, and the
driver's timeout left `rc=124, parsed: null`. These tests simulate that
failure mode (a child that blocks forever) and assert the invariant the
rewrite guarantees: every completed metric is already on stdout as a
flushed cumulative JSON line — and mirrored to BENCH_partial.json —
before the next metric starts, so a kill at ANY moment preserves the
record. (Analog of the reference's perf-baseline protocol, SURVEY §6.)
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_overrides, timeout=120, tmp_path=None):
    env = dict(os.environ)
    env.update(env_overrides)
    # the axon plugin ignores JAX_PLATFORMS; BENCH_FORCE_PLATFORM is the
    # bench's own post-import override (see bench._setup_jax)
    env.setdefault("BENCH_FORCE_PLATFORM", "cpu")
    env.setdefault("BENCH_PROBE_TIMEOUT", "60")
    # keep the test's partial file out of the repo root
    cwd = str(tmp_path) if tmp_path is not None else REPO
    proc = subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, env=env, cwd=cwd)
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.strip().startswith("{")]
    return proc, lines


@pytest.mark.slow
class TestBenchWatchdog:

    def test_hung_probe_yields_error_record_rc0(self):
        """A relay that blocks at device discovery must produce an error
        record (rc 0), not silence: the round artifact survives."""
        proc, lines = _run({"BENCH_FAKE_HANG": "probe",
                            "BENCH_PROBE_TIMEOUT": "3",
                            "BENCH_METRICS": "_selftest"})
        assert proc.returncode == 0
        assert lines, proc.stdout + proc.stderr
        final = lines[-1]
        assert "timed out" in final["error"]
        assert final["metric"] == "randlanet_inference_points_per_sec"

    def test_completed_metrics_survive_a_later_hang(self):
        """Metric 1 completes, metric 2 hangs: metric 1's value must
        already be on stdout before the hang resolves, and the final
        record must carry both the value and the timeout error."""
        proc, lines = _run({"BENCH_METRIC_TIMEOUT": "25",
                            "BENCH_METRICS": "_selftest,_selfhang"})
        assert proc.returncode == 0
        # cumulative emission: some line has selftest but no hang error yet
        assert any(ln.get("selftest") == 1 and "_selfhang_error" not in ln
                   for ln in lines)
        final = lines[-1]
        assert final["selftest"] == 1
        assert "timed out" in final["_selfhang_error"]

    def test_two_consecutive_timeouts_bail(self, tmp_path):
        """Two hung metrics in a row = dead backend: bail with the
        partial record instead of eating every remaining timeout."""
        proc, lines = _run({"BENCH_METRIC_TIMEOUT": "25",
                            "BENCH_METRICS":
                                "_selfhang,_selfhang,_selftest"},
                           tmp_path=tmp_path)
        assert proc.returncode == 0
        final = lines[-1]
        assert "presumed dead" in final["error"]
        assert "selftest" not in final  # never reached
        # the partial file mirrors the final record
        part = json.load(open(tmp_path / "BENCH_partial.json"))
        assert part == final
