"""The perf-guard orchestrator's verdict/retry/merge logic is jax-free
pure Python (tools/perf_guard.py orchestrate) — the measurement workers
need the chip, but the budget verdict, the min-of-two-draws merge, the
drift-burst classification and the numerics-failure propagation do not.
Simulated worker reports exercise every branch the hardware path relies
on."""

import argparse
import importlib.util
import json
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def pg():
    spec = importlib.util.spec_from_file_location(
        "perf_guard", REPO / "tools" / "perf_guard.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["perf_guard"] = mod
    spec.loader.exec_module(mod)
    return mod


def healthy_report(pg):
    ms = {name: budget * 0.7 for name, budget in pg.BUDGET_MS.items()}
    ms["xla"] = 18.7
    ms["xla_multi4"] = 18.9
    ms["fused_multi4"] = ms["xla_multi4"] / 2.1
    return {"ms_per_step": ms,
            "examples_per_sec": {k: 1.0 for k in ms},
            "fused_speedup_vs_xla": 2.1,
            "budgets_ms": pg.BUDGET_MS}


def run_orchestrate(pg, monkeypatch, tmp_path, reports, rcs=None,
                    numerics=False):
    """Drive orchestrate() with scripted worker reports; returns
    (exit_code, final_report, worker_calls)."""
    calls = []

    def fake_worker(want_numerics, json_path):
        i = len(calls)
        calls.append(want_numerics)
        rep = reports[i]
        if rep is not None:
            pathlib.Path(json_path).write_text(json.dumps(rep))
        return rep, (rcs or [0] * len(reports))[i]

    monkeypatch.setattr(pg, "_run_worker", fake_worker)
    monkeypatch.setattr(pg.time, "sleep", lambda s: None)
    out = tmp_path / "out.json"
    args = argparse.Namespace(numerics=numerics, json_out=str(out),
                              no_retry=False, worker=False)
    rc = pg.orchestrate(args)
    final = json.loads(out.read_text()) if out.exists() else None
    return rc, final, calls


def test_healthy_run_passes_without_retry(pg, monkeypatch, tmp_path):
    rc, final, calls = run_orchestrate(
        pg, monkeypatch, tmp_path, [healthy_report(pg)])
    assert rc == 0
    assert len(calls) == 1
    assert "retry_ms_per_step" not in final


def test_burst_then_healthy_retry_passes(pg, monkeypatch, tmp_path):
    burst = healthy_report(pg)
    burst["ms_per_step"] = dict(burst["ms_per_step"],
                                fused_multi4=14.7, fused_full=19.7)
    burst["fused_speedup_vs_xla"] = 1.38
    rc, final, calls = run_orchestrate(
        pg, monkeypatch, tmp_path, [burst, healthy_report(pg)])
    assert rc == 0
    assert len(calls) == 2
    assert calls[1] is False  # retry never re-runs numerics
    # merged report keeps the per-variant min and records both draws
    assert final["ms_per_step"]["fused_multi4"] == pytest.approx(
        healthy_report(pg)["ms_per_step"]["fused_multi4"])
    assert final["first_attempt_ms_per_step"]["fused_multi4"] == 14.7
    assert "retry_ms_per_step" in final


def test_sustained_burst_fails_with_drift_classification(
        pg, monkeypatch, tmp_path):
    """Both draws inflated on the small Mosaic paths only -> red run, but
    the artifact self-documents the chip-state drift signature."""
    def burst():
        rep = healthy_report(pg)
        rep["ms_per_step"] = dict(rep["ms_per_step"], fused_multi4=14.0,
                                  fused_full=16.1, sasrec_multi4=14.2)
        rep["fused_speedup_vs_xla"] = 1.4
        return rep
    rc, final, calls = run_orchestrate(
        pg, monkeypatch, tmp_path, [burst(), burst()])
    assert rc == 1
    assert len(calls) == 2
    assert "drift_burst_suspected" in final


def test_genuine_large_kernel_regression_not_classified_as_drift(
        pg, monkeypatch, tmp_path):
    def bad():
        rep = healthy_report(pg)
        rep["ms_per_step"] = dict(rep["ms_per_step"], reddit_tiled=80.0)
        return rep
    rc, final, _ = run_orchestrate(
        pg, monkeypatch, tmp_path, [bad(), bad()])
    assert rc == 1
    assert "drift_burst_suspected" not in final


def test_numerics_failure_skips_retry_and_fails(pg, monkeypatch, tmp_path):
    rep = healthy_report(pg)
    # budgets also missed: the retry must NOT run (the chip already
    # produced broken numerics; perf evidence is secondary)
    rep["ms_per_step"] = dict(rep["ms_per_step"], fused_multi4=14.0)
    rep["numerics"] = {"status": "failed", "check": "verify_fused_layer",
                       "error": "AssertionError: boom"}
    rc, final, calls = run_orchestrate(
        pg, monkeypatch, tmp_path, [rep], rcs=[1], numerics=True)
    assert rc == 1
    assert len(calls) == 1
    assert final["numerics"]["status"] == "failed"


def test_worker_with_no_report_propagates_failure(pg, monkeypatch,
                                                  tmp_path):
    rc, final, calls = run_orchestrate(
        pg, monkeypatch, tmp_path, [None], rcs=[3])
    assert rc == 3
    assert final is None
