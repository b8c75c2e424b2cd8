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


def test_bench_emits_json_when_backend_init_raises(tmp_path):
    sidecar = str(tmp_path / "detail.json")
    env = dict(os.environ, LFTPU_BENCH_FORCE_FAIL="backend",
               LFTPU_BENCH_DETAIL=sidecar)
    out, lines = _run(["--probe-retries", "1", "--probe-timeout", "60",
                       "--cpu-timeout", "240"], env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert len(lines) == 1, out.stdout
    assert len(lines[0]) < 2000, len(lines[0])
    res = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in res, res
    assert res["detail"]["capture_error"], res
    assert res["detail"]["backend"] == "none"
    assert res["detail"]["capture_ok"] is False
    # the attempt log lives in the sidecar: both the probe and the
    # forced-CPU retry must have been attempted
    stages = [a["stage"] for a in
              json.load(open(sidecar))["detail"]["capture_attempts"]]
    assert "probe" in stages and "cpu_worker" in stages


@pytest.mark.slow
def test_bench_cpu_capture_end_to_end(tmp_path):
    """A degraded (forced-CPU) capture still produces a full,
    self-describing artifact: real throughput numbers plus explicit
    *_skipped markers for every TPU-gated section — headline keys on
    the compact stdout line, everything in the detail sidecar."""
    sidecar = str(tmp_path / "detail.json")
    env = dict(os.environ, LFTPU_BENCH_DETAIL=sidecar)
    out, lines = _run(["--cpu", "--steps", "30", "--walkers", "8",
                       "--nsrc", "60", "--ab-reps", "1",
                       "--baseline-evals", "3", "--baseline-reps", "2",
                       "--baseline-tau-steps", "0",
                       "--cpu-timeout", "900"], env=env, timeout=960)
    assert out.returncode == 0, out.stderr[-2000:]
    assert len(lines) == 1, out.stdout
    assert len(lines[0]) < 2000, len(lines[0])
    res = json.loads(lines[0])
    d = res["detail"]
    assert d["backend"] == "cpu"
    assert d["capture_error"] is None
    assert d["capture_ok"] is True
    assert res["value"] > 0 and res["vs_baseline"] > 0
    for marker in ("pallas_skipped", "stream_skipped", "nuts_skipped",
                   "evidence_skipped"):
        assert "tpu" in d[marker], (marker, d.get(marker))
    # the sidecar carries the FULL detail (spreads etc. that the
    # compact headline drops)
    full = json.load(open(sidecar))
    fd = full["detail"]
    assert len(fd["baseline_evals_per_sec_spread"]) == 2
    assert fd["backend"] == "cpu"
    for k, v in d.items():
        if k not in ("capture_ok", "detail_file"):
            assert fd[k] == v, k


def test_bench_stdout_line_stays_under_driver_buffer(tmp_path, capsys,
                                                     monkeypatch):
    """The compact emitter keeps the stdout line under the driver's
    2,000-char tail buffer even for a maximal result dict carrying
    every metric family (the BENCH_r04 failure mode: the single line
    grew to ~2.6 KB and parsed as null)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    detail = {"backend": "tpu", "device": "TPU v5 lite0",
              "capture_error": None, "engine": "pallas"}
    # every whitelisted key populated, plus 40 bulk keys the whitelist
    # must NOT leak onto stdout
    for k in bench._HEADLINE_DETAIL_KEYS:
        detail.setdefault(k, 123456789.123456)
    for i in range(40):
        detail[f"bulk_metric_with_a_long_name_{i:02d}"] = [
            1.234567890123] * 8
    detail["capture_attempts"] = [
        {"stage": "probe", "ok": True, "backend": "tpu",
         "device": "TPU v5 lite0"},
        {"stage": "worker", "ok": True, "error": None}]
    result = {"metric": "lnprob_evals_per_sec_100walker_chain",
              "value": 5885899.8, "unit": "evals/s",
              "vs_baseline": 16142.7, "detail": detail}
    sidecar = str(tmp_path / "detail.json")
    monkeypatch.setenv("LFTPU_BENCH_DETAIL", sidecar)
    bench.emit_result(result)
    line = capsys.readouterr().out.strip()
    assert len(line) < 2000, len(line)
    res = json.loads(line)
    assert res["value"] == 5885899.8
    assert res["detail"]["capture_ok"] is True
    assert not any(k.startswith("bulk_metric") for k in res["detail"])
    # nothing was dropped by the defensive truncation: every
    # whitelisted key survived
    for k in bench._HEADLINE_DETAIL_KEYS:
        assert k in res["detail"], k
    # the sidecar holds the complete dict INCLUDING the derived
    # capture_ok (computed before the dump, not only for stdout)
    full = json.load(open(sidecar))
    assert "bulk_metric_with_a_long_name_39" in full["detail"]
    assert full["detail"]["capture_ok"] is True


def test_bench_budget_drop_protects_pointer_and_markers(
        tmp_path, capsys, monkeypatch):
    """Under budget pressure the emitter drops real metrics from the
    tail — never the detail_file pointer (the only reference to where
    the dropped data lives) or the *_skipped self-description
    markers."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # huge values force the drop loop to run
    detail = {k: "x" * 120 for k in bench._HEADLINE_DETAIL_KEYS}
    detail["nuts_skipped"] = "disabled by --nuts-chains 0"
    result = {"metric": "m", "value": 1, "unit": "u",
              "vs_baseline": 1, "detail": detail}
    sidecar = str(tmp_path / "detail.json")
    monkeypatch.setenv("LFTPU_BENCH_DETAIL", sidecar)
    bench.emit_result(result)
    line = capsys.readouterr().out.strip()
    assert len(line) < 2000, len(line)
    res = json.loads(line)
    # some metrics were dropped, but the pointer + marker survived;
    # under an LFTPU_BENCH_DETAIL override the pointer is the FULL
    # path (a bare basename could not locate the sidecar)
    assert len(res["detail"]) < len(detail) + 1
    assert res["detail"]["detail_file"] == sidecar
    assert res["detail"]["nuts_skipped"] == (
        "disabled by --nuts-chains 0")
