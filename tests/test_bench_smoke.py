"""bench.py --smoke: the driver-contract JSON line must be producible
offline (plumbing check for the benchmark the driver runs on hardware)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_main_with_fake_workers(monkeypatch, capsys, results):
    """Drive bench.main() with a scripted run_worker; returns the JSON."""
    import bench

    calls = iter(results)

    def fake_worker(flag):
        return next(calls)

    monkeypatch.setattr(bench, "run_worker", fake_worker)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    return json.loads(lines[-1])


def test_bench_drift_classifier_flags_degraded_window(monkeypatch, capsys):
    """All draws: healthy XLA anchor but fused/anchor below the healthy
    band -> the artifact self-classifies the window as chip drift."""
    import bench
    draws = [("tpu", 21000.0, 13500.0)] * bench.TPU_MEASUREMENTS
    payload = _run_main_with_fake_workers(
        monkeypatch, capsys, draws + [("cpu", 40.0, None)])
    assert payload["value"] == 21000.0
    assert payload["anchor_xla_examples_per_sec"] == 13500.0
    assert 0 < payload["fused_vs_anchor"] < bench.HEALTHY_FUSED_RATIO
    assert "drift_burst_suspected" in payload
    assert len(payload["tpu_draws"]) == bench.TPU_MEASUREMENTS
    assert payload["tpu_draws"][0]["anchor_xla"] == 13500.0


def test_bench_healthy_draw_carries_no_drift_flag(monkeypatch, capsys):
    import bench
    draws = ([("tpu", 22000.0, 13500.0)]
             + [("tpu", 29500.0, 13600.0)] * (bench.TPU_MEASUREMENTS - 1))
    payload = _run_main_with_fake_workers(
        monkeypatch, capsys, draws + [("cpu", 40.0, None)])
    assert payload["value"] == 29500.0  # best draw kept
    assert payload["fused_vs_anchor"] >= bench.HEALTHY_FUSED_RATIO
    assert "drift_burst_suspected" not in payload
    assert payload["vs_baseline"] == round(29500.0 / 40.0, 3)


def test_bench_smoke_emits_json_line():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout
    payload = json.loads(lines[-1])
    assert payload["unit"] == "examples/s"
    assert payload["value"] > 0
    assert "metric" in payload and "vs_baseline" in payload
