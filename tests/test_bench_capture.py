"""bench.py capture hardening (VERDICT r3 #1).

BENCH_r03 was lost because backend init raised UNAVAILABLE and
``bench.py`` crashed with no JSON on stdout. These tests pin the
repaired invariant: ``python bench.py`` prints exactly one valid JSON
line on EVERY exit path, with ``detail.backend`` and
``detail.capture_error`` making degraded captures self-describing.

The backend failure is injected via LFTPU_BENCH_FORCE_FAIL=backend
(honored by both the probe subprocess and the worker), simulating the
flaky axon tunnel raising at backend acquisition.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench.py")


def _run(extra, env=None, timeout=600):
    out = subprocess.run([sys.executable, BENCH] + extra,
                         capture_output=True, text=True,
                         timeout=timeout, env=env)
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    return out, lines


def test_bench_emits_json_when_backend_init_raises():
    env = dict(os.environ, LFTPU_BENCH_FORCE_FAIL="backend")
    out, lines = _run(["--probe-retries", "1", "--probe-timeout", "60",
                       "--cpu-timeout", "240"], env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert len(lines) == 1, out.stdout
    res = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in res, res
    assert res["detail"]["capture_error"], res
    assert res["detail"]["backend"] == "none"
    stages = [a["stage"] for a in res["detail"]["capture_attempts"]]
    # both the probe and the forced-CPU retry must have been attempted
    assert "probe" in stages and "cpu_worker" in stages


@pytest.mark.slow
def test_bench_cpu_capture_end_to_end():
    """A degraded (forced-CPU) capture still produces a full,
    self-describing artifact: real throughput numbers plus explicit
    *_skipped markers for every TPU-gated section."""
    out, lines = _run(["--cpu", "--steps", "30", "--walkers", "8",
                       "--nsrc", "60", "--ab-reps", "1",
                       "--baseline-evals", "3", "--baseline-reps", "2",
                       "--baseline-tau-steps", "0",
                       "--cpu-timeout", "900"], timeout=960)
    assert out.returncode == 0, out.stderr[-2000:]
    assert len(lines) == 1, out.stdout
    res = json.loads(lines[0])
    d = res["detail"]
    assert d["backend"] == "cpu"
    assert d["capture_error"] is None
    assert res["value"] > 0 and res["vs_baseline"] > 0
    assert len(d["baseline_evals_per_sec_spread"]) == 2
    for marker in ("pallas_skipped", "stream_skipped", "nuts_skipped",
                   "evidence_skipped"):
        assert "tpu" in d[marker], (marker, d.get(marker))
