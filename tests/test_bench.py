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
        """A relay that blocks at device discovery past the whole retry
        budget must produce an error record (rc 0), not silence: the
        round artifact survives."""
        proc, lines = _run({"BENCH_FAKE_HANG": "probe",
                            "BENCH_PROBE_TIMEOUT": "3",
                            "BENCH_PROBE_BUDGET": "8",
                            "BENCH_PROBE_RETRY_SLEEP": "1",
                            "BENCH_METRICS": "_selftest"})
        assert proc.returncode == 0
        assert lines, proc.stdout + proc.stderr
        final = lines[-1]
        assert "timed out" in final["error"]
        assert final["probe_attempts"] >= 2  # it did retry
        assert final["metric"] == "randlanet_inference_points_per_sec"

    def test_probe_flap_recovers(self, tmp_path):
        """A probe that hangs ONCE and then recovers (the measured relay
        failure mode) must cost one retry, not the round: the run
        proceeds to its metrics with no error in the final record."""
        proc, lines = _run({"BENCH_FAKE_HANG": "probe_flap",
                            "BENCH_FLAP_STATE": str(tmp_path),
                            "BENCH_PROBE_TIMEOUT": "10",
                            "BENCH_PROBE_BUDGET": "120",
                            "BENCH_PROBE_RETRY_SLEEP": "1",
                            "BENCH_METRICS": "_selftest"},
                           tmp_path=tmp_path)
        assert proc.returncode == 0
        final = lines[-1]
        assert "error" not in final, final
        assert final["selftest"] == 1
        assert final["probe_attempts"] == 2

    def test_metric_flap_rescued_by_reprobe(self, tmp_path):
        """Two consecutive metric timeouts during a flap that then
        recovers: the parent re-probes, retries BOTH eaten metrics, and
        the final record carries their values with no error."""
        proc, lines = _run({"BENCH_FLAP_STATE": str(tmp_path),
                            "BENCH_METRIC_TIMEOUT": "10",
                            "BENCH_PROBE_RETRY_SLEEP": "1",
                            "BENCH_METRICS": "_selfflap_a,_selfflap_b"},
                           tmp_path=tmp_path, timeout=180)
        assert proc.returncode == 0
        final = lines[-1]
        assert "error" not in final, final
        assert final["selfflap_a"] == 1 and final["selfflap_b"] == 1
        # the stale timeout errors from the first pass were cleared
        assert "_selfflap_a_error" not in final
        assert "_selfflap_b_error" not in final

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
        """Two hung metrics in a row with rescues exhausted = dead
        backend: bail with the partial record instead of eating every
        remaining timeout. (BENCH_FLAP_RESCUES=0 pins the no-rescue
        path; the rescue path is covered above.)"""
        proc, lines = _run({"BENCH_METRIC_TIMEOUT": "25",
                            "BENCH_FLAP_RESCUES": "0",
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
