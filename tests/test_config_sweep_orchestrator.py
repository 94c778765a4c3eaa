"""The config-sweep orchestrator's jax-free logic (tools/config_sweep.py
main): worker-failure retry + missing-config accounting, the >1.3x
drift-retry keep-cleaner-window merge, normalization, and the
degraded-chip refusal — exercised with scripted worker results, no
hardware (mirrors tests/test_perf_guard_orchestrator.py)."""

import importlib.util
import json
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
N_CONFIGS = 13


@pytest.fixture(scope="module")
def cs():
    spec = importlib.util.spec_from_file_location(
        "config_sweep", REPO / "tools" / "config_sweep.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["config_sweep"] = mod
    spec.loader.exec_module(mod)
    return mod


def result(name, ms=10.0, sentinel=9.0):
    return {"name": name, "ms": ms, "sentinel_ms": sentinel,
            "compile_s": 1.0,
            "meta": {"vocab": 100, "seq": 50, "npred": 20, "batch": 256,
                     "layer_kernel": "fused_layer",
                     "loss_kernel": "whole_table"}}


def run_main(cs, monkeypatch, tmp_path, worker_fn):
    calls = []

    def fake(name, rounds, timeout_s=900):
        calls.append(name)
        return worker_fn(name, len(calls))

    monkeypatch.setattr(cs, "_run_worker", fake)
    monkeypatch.setattr(cs.time, "sleep", lambda s: None)
    out = tmp_path / "sweep.json"
    rc = cs.main(["--json-out", str(out)])
    report = json.loads(out.read_text()) if out.exists() else None
    return rc, report, calls


def test_healthy_run_measures_all_13(cs, monkeypatch, tmp_path):
    rc, report, calls = run_main(
        cs, monkeypatch, tmp_path, lambda name, i: result(name))
    assert rc == 0
    assert len(report["configs"]) == N_CONFIGS
    assert len(calls) == N_CONFIGS
    assert "missing_configs" not in report
    assert report["sentinel"]["best_ms"] == 9.0


def test_wedged_worker_retried_then_recorded_missing(cs, monkeypatch,
                                                     tmp_path):
    def worker(name, i):
        return None if name == "reddit_128" else result(name)
    rc, report, calls = run_main(cs, monkeypatch, tmp_path, worker)
    assert rc == 1
    assert calls.count("reddit_128") == 2  # one fresh-process retry
    assert report["missing_configs"] == ["reddit_128"]
    assert len(report["configs"]) == N_CONFIGS - 1  # others preserved


def test_transient_failure_recovers_on_retry(cs, monkeypatch, tmp_path):
    seen = {}

    def worker(name, i):
        if name == "steam_64" and not seen.get(name):
            seen[name] = True
            return None
        return result(name)
    rc, report, _ = run_main(cs, monkeypatch, tmp_path, worker)
    assert rc == 0
    assert len(report["configs"]) == N_CONFIGS


def test_drift_retry_keeps_cleaner_window(cs, monkeypatch, tmp_path):
    def worker(name, i):
        if name == "ml-1m_64":
            # first draw inflated (sentinel 20 > 1.3 x best 9);
            # retry draw clean with a different raw ms
            return (result(name, ms=18.0, sentinel=20.0) if i <= N_CONFIGS
                    else result(name, ms=9.5, sentinel=9.2))
        return result(name)
    rc, report, calls = run_main(cs, monkeypatch, tmp_path, worker)
    assert rc == 0
    assert calls.count("ml-1m_64") == 2
    row = report["configs"]["ml-1m_64"]
    assert row["ms_per_step_raw"] == 9.5          # cleaner window kept
    assert row["sentinel_ms_at_window"] == 9.2
    assert report["sentinel"]["worst_observed_ms"] == 20.0
    assert report["sentinel"]["worst_used_ms"] < 10


def test_drift_retry_failure_keeps_first_window(cs, monkeypatch,
                                                tmp_path):
    def worker(name, i):
        if name == "ml-1m_64":
            return (result(name, ms=18.0, sentinel=20.0) if i <= N_CONFIGS
                    else None)
        return result(name)
    rc, report, _ = run_main(cs, monkeypatch, tmp_path, worker)
    assert report["configs"]["ml-1m_64"]["ms_per_step_raw"] == 18.0
    # normalization still applied against the healthy best
    assert report["configs"]["ml-1m_64"]["ms_per_step"] == pytest.approx(
        18.0 * 9.0 / 20.0, rel=1e-6)


def test_whole_run_degraded_is_refused(cs, monkeypatch, tmp_path):
    rc, report, _ = run_main(
        cs, monkeypatch, tmp_path,
        lambda name, i: result(name, ms=20.0, sentinel=18.0))
    assert rc == 1
    assert "degraded_chip_state" in report
