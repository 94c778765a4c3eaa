"""One-command release validation: everything that must be green before
shipping, in the right order, with the TPU-access discipline built in.

    python tools/release_check.py              # full: CPU suite + TPU checks
    python tools/release_check.py --fast       # skip the full CPU suite
    python tools/release_check.py --cpu-only   # no TPU stages

Stages (each a subprocess with a hard deadline):

1. driver hooks      — ``__graft_entry__.py`` self-test (CPU, 8 virtual dev)
2. CPU test suite    — ``pytest tests/ -q`` (skipped with --fast)
3. bench smoke       — ``bench.py --smoke`` (CPU, schema check)
4. quality smokes    — both model families, tiny scale (CPU-forced)
5. TPU perf guard    — ``perf_guard.py --numerics`` (budgets + kernel
                       numerics on the real chip)
6. TPU quality smokes — ``quality_run.py --smoke --smoke-scale ml1m``
                       and ``ml20m`` (whole-table + vocab-tiled loss paths)

TPU stages run strictly serially with cool-downs between processes; a
stage that prints nothing until its deadline is treated as a wedged
tunnel claim and retried ONCE after a longer cool-down (the documented
failure mode of this rig — see CLAUDE.md).
"""

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
PY = sys.executable
TPU_COOLDOWN_S = 75
TPU_RETRY_COOLDOWN_S = 120


def run_stage(name, cmd, timeout, cwd=REPO, retry_tpu=False):
    """Run one stage; returns (ok, seconds). TPU stages retry once on a
    timeout (wedged claim)."""
    attempts = 2 if retry_tpu else 1
    for attempt in range(attempts):
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, cwd=cwd, capture_output=True,
                                  text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            dt = time.time() - t0
            if attempt + 1 < attempts:
                print(f"[release] {name}: no result in {dt:.0f}s (wedged "
                      f"tunnel claim?) — cooling down "
                      f"{TPU_RETRY_COOLDOWN_S}s and retrying once",
                      flush=True)
                time.sleep(TPU_RETRY_COOLDOWN_S)
                continue
            print(f"[release] FAIL {name}: timed out after {dt:.0f}s",
                  flush=True)
            return False, dt
        dt = time.time() - t0
        if proc.returncode == 0:
            print(f"[release] ok   {name} ({dt:.0f}s)", flush=True)
            return True, dt
        tail = (proc.stdout[-1500:] + proc.stderr[-1500:]).strip()
        print(f"[release] FAIL {name} (exit {proc.returncode}, {dt:.0f}s)\n"
              f"{tail}", flush=True)
        return False, dt
    return False, 0.0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--fast", action="store_true",
                   help="skip the full CPU test suite (~14 min)")
    p.add_argument("--cpu-only", action="store_true",
                   help="skip the TPU stages")
    args = p.parse_args(argv)

    results = {}

    def stage(name, cmd, timeout, tpu=False):
        if tpu:
            time.sleep(TPU_COOLDOWN_S)
        ok, dt = run_stage(name, cmd, timeout, retry_tpu=tpu)
        results[name] = {"ok": ok, "seconds": round(dt, 1)}
        return ok

    stage("driver-hooks", [PY, "__graft_entry__.py"], 600)
    if not args.fast:
        stage("cpu-suite", [PY, "-m", "pytest", "tests/", "-q"], 1800)
    stage("bench-smoke", [PY, "bench.py", "--smoke"], 300)
    for family in ("bert4rec", "sasrec"):
        stage(f"quality-smoke-{family}",
              [PY, "-c",
               "import jax; jax.config.update('jax_platforms', 'cpu'); "
               "import sys; sys.path.insert(0, '.'); "
               "import runpy; sys.argv = ['quality_run.py', '--smoke', "
               f"'--smoke-family', '{family}', '--out', "
               f"'/tmp/release_q_{family}']; "
               "runpy.run_path('tools/quality_run.py', "
               "run_name='__main__')"],
              600)

    if not args.cpu_only:
        # nine variants (incl. the 12-layer bert_base_512 compile and the
        # 335k-vocab reddit_tiled) + the full numerics chain need headroom
        stage("tpu-perf-guard",
              [PY, "tools/perf_guard.py", "--numerics"], 1500, tpu=True)
        # ml1m covers the whole-table-in-VMEM fused loss; ml20m covers the
        # vocab-tiled flash-softmax loss inside the same quality loop
        for scale in ("ml1m", "ml20m"):
            stage(f"tpu-quality-{scale}-scale",
                  [PY, "tools/quality_run.py", "--smoke",
                   "--smoke-scale", scale, "--out",
                   f"/tmp/release_q_{scale}"], 580, tpu=True)

    ok = all(r["ok"] for r in results.values())
    print(json.dumps({"release_check": "PASS" if ok else "FAIL",
                      "stages": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
