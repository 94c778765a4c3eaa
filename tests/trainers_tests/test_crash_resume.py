"""Failure-recovery proof: SIGKILL a training process mid-run, restart it,
and the resumed run's final parameters are BITWISE identical to an
uninterrupted run's.

This is the determinism contract the checkpoint system promises (params +
optimizer state + step + rng + epoch counter, with per-epoch masking seeds
derived from seed + epoch): recovery is exact, not approximate. The
reference can't do this — it restores weights only (optimizer-state
restore disabled, reference bert4rec_trainer.py:57-58).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

WORKER = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      "crash_resume_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
EPOCHS = 4
KILL_AFTER_EPOCH = 1  # 0-indexed: killed while "epoch 3" is nominally next


def _env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(args, timeout=300):
    proc = subprocess.run([sys.executable, WORKER, *args], env=_env(),
                          cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)
    assert proc.returncode == 0, \
        f"worker {args} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}"


@pytest.mark.slow
def test_sigkill_resume_is_bitwise_exact(tmp_path):
    ckpt = str(tmp_path / "ckpt.npz")
    out_resumed = str(tmp_path / "resumed.json")
    kill_file = str(tmp_path / "kill_me")

    # 1) run that asks to be SIGKILLed after epoch KILL_AFTER_EPOCH's
    # checkpoint is on disk
    proc = subprocess.Popen(
        [sys.executable, WORKER, "run", ckpt, out_resumed, str(EPOCHS),
         kill_file, str(KILL_AFTER_EPOCH)],
        env=_env(), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)
    # worker signature: run <ckpt> <out> <epochs> [<kill_file> <epoch>]
    deadline = time.monotonic() + 240
    while not os.path.exists(kill_file):
        if proc.poll() is not None:
            stdout, stderr = proc.communicate()
            raise AssertionError(
                f"worker exited before kill point:\n{stdout[-2000:]}\n"
                f"{stderr[-3000:]}")
        assert time.monotonic() < deadline, "kill point never reached"
        time.sleep(0.1)
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=30)
    assert os.path.exists(ckpt), "no checkpoint survived the kill"
    assert not os.path.exists(out_resumed), "output written before kill?!"

    # 2) restart the SAME command (no kill this time) — auto-resume picks
    # up at epoch KILL_AFTER_EPOCH + 1
    _run(["run", ckpt, out_resumed, str(EPOCHS)])

    # 3) uninterrupted oracle
    out_oracle = str(tmp_path / "oracle.json")
    _run(["run", str(tmp_path / "oracle_ckpt.npz"), out_oracle,
          str(EPOCHS)])

    with open(out_resumed) as f:
        resumed = json.load(f)
    with open(out_oracle) as f:
        oracle = json.load(f)

    assert resumed["step"] == oracle["step"]
    assert resumed["digests"] == oracle["digests"], \
        "resumed params are not bitwise identical to the uninterrupted run"
    # the resumed history holds only the post-crash epochs — and they match
    # the oracle's same-numbered epochs exactly
    n = len(resumed["loss"])
    assert 0 < n < EPOCHS
    assert resumed["loss"] == oracle["loss"][EPOCHS - n:]
