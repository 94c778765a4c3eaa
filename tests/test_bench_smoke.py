"""bench.py --smoke: the driver-contract JSON line must be producible
offline (plumbing check for the benchmark the driver runs on hardware)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
