"""Worker for the real 2-process multi-host test (tests/test_multihost.py).

Not collected by pytest. Two modes:

- ``dist <pid> <coordinator> <out.json>``: one of two ``jax.distributed``
  processes (gloo CPU collectives, 4 virtual devices each -> 8 global).
  Exercises the ``jax.process_count() > 1`` branches: per-host dataset
  sharding (``shard_for_process``), global batch assembly
  (``jax.make_array_from_process_local_data``) in trainer AND evaluator.
- ``single <out.json>``: the oracle — one process, 8 virtual devices, fed
  the IDENTICAL global batches (the two per-process shards zipped and
  concatenated), so losses/metrics must match the distributed run exactly.
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
os.environ["BERT4REC_TPU_NATIVE"] = os.environ.get("BERT4REC_TPU_NATIVE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

VOCAB = 67
SEQ = 16
GLOBAL_BATCH = 32
SEED = 42


def build_datasets():
    """Identical on every process (same seed)."""
    from bert4rec_tpu.dataloaders.processed_dataset import (
        MaskingConfig, ProcessedDataset,
    )
    rng = np.random.default_rng(7)

    def seqs(n):
        return [((np.arange(int(rng.integers(8, SEQ + 1)))
                  + int(rng.integers(0, VOCAB - 3))) % (VOCAB - 3) + 3)
                .astype(np.int32) for _ in range(n)]

    cfg = MaskingConfig(max_seq_len=SEQ, max_predictions_per_seq=4,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.3)
    train = ProcessedDataset(seqs(128), cfg, lambda: VOCAB)
    val = ProcessedDataset(seqs(64), cfg, lambda: VOCAB)
    test_rows = seqs(64)
    test = ProcessedDataset(test_rows, cfg, lambda: VOCAB,
                            finetuning=np.ones(64, bool))
    return train, val, test, test_rows


def build_model_and_mesh():
    from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
    from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
    mesh = create_mesh(MeshConfig(model_parallelism=2))  # DP(4) x TP(2)
    model = BERT4RecModel(config=BERT4RecConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=2,
        num_attention_heads=4, inner_dim=64, max_sequence_length=SEQ,
        max_predictions_per_seq=4, vocab_pad_to=8,
        # route training through the shard_map'd cross-shard fused loss
        # (interpret kernels on CPU) — proven against the single-process
        # oracle like everything else
        use_fused_loss=True))
    return model, mesh


def build_evaluator(test_rows, mesh, device_negatives=None):
    from bert4rec_tpu.dataloaders import samplers
    from bert4rec_tpu.evaluation import BERT4RecEvaluator
    source = [int(t) for s in test_rows for t in s]
    sampler = samplers.get("pop_random", source=source,
                           vocab=list(dict.fromkeys(source)),
                           sample_size=10, seed=0)
    # seed=0: the dist-vs-single-oracle comparison needs identical negative
    # draws (an unseeded evaluator draws fresh OS entropy per run)
    return BERT4RecEvaluator(sampler=sampler, sample_size=10, mesh=mesh,
                             static_shapes=True, seed=0,
                             device_negatives=device_negatives)


class ZippedShards:
    """Oracle-side dataset: yields the distributed run's global batches —
    each process's local batch (same per-shard seeds) concatenated in
    process order."""

    def __init__(self, shards):
        self.shards = shards

    def batches(self, batch_size, **kw):
        local_bs = batch_size // len(self.shards)
        iters = [s.batches(local_bs, **kw) for s in self.shards]
        while True:
            locals_ = []
            for it in iters:
                nxt = next(it, None)
                if nxt is None:
                    return
                locals_.append(nxt)
            yield {k: np.concatenate([loc[k] for loc in locals_])
                   for k in locals_[0]}


def run(train_l, val_l, test_l, batch_size, mesh, model, test_rows,
        ckpt_path=None):
    from bert4rec_tpu.trainers import BERT4RecTrainer
    # steps_per_call=2 also exercises the stacked [K, B, ...] global-batch
    # assembly under multi-process (math-identical to single-step)
    trainer = BERT4RecTrainer(model, mesh=mesh, steps_per_call=2)
    trainer.initialize_model(rng=jax.random.key(0))
    history = trainer.train(train_l, val_l, epochs=2,
                            batch_size=batch_size, seed=SEED, verbose=False)
    evaluator = build_evaluator(test_rows, mesh)
    results = evaluator.evaluate(model, trainer.state["params"], test_l,
                                 batch_size=batch_size, progress_bar=False,
                                 seed=3)
    # the HOST-sampling evaluator branch (make_array of candidates) must
    # also run under multi-process; negatives differ from the oracle's
    # stream, so the test checks process-agreement + statistical closeness
    ev_host = build_evaluator(test_rows, mesh, device_negatives=False)
    results_host = ev_host.evaluate(model, trainer.state["params"], test_l,
                                    batch_size=batch_size,
                                    progress_bar=False, seed=3)
    payload = {"history": {k: [float(x) for x in v]
                           for k, v in history.history.items()},
               "eval": {k: float(v) for k, v in results.items()},
               "eval_host": {k: float(v) for k, v in results_host.items()}}

    if ckpt_path is not None:
        # checkpoint round trip THROUGH the multi-host collective-gather /
        # process-0-write path: save the trained state, restore it into a
        # freshly (differently) initialized trainer, and validate — the
        # restored state must reproduce the original's metrics exactly
        trainer.save_checkpoint(ckpt_path)
        restored = BERT4RecTrainer(model, mesh=mesh, steps_per_call=2)
        restored.initialize_model(rng=jax.random.key(123))
        restored.load_checkpoint(ckpt_path)
        payload["val_original"] = trainer.validate(
            val_l, batch_size=batch_size, seed=9)
        payload["val_restored"] = restored.validate(
            val_l, batch_size=batch_size, seed=9)
    return payload


def main():
    mode = sys.argv[1]
    if mode == "dist":
        pid, coordinator, out = int(sys.argv[2]), sys.argv[3], sys.argv[4]
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=2, process_id=pid)
        assert jax.process_count() == 2 and jax.device_count() == 8
        train, val, test, test_rows = build_datasets()
        model, mesh = build_model_and_mesh()
        # both processes derive the SAME checkpoint path from the shared
        # output directory — exactly what a real multi-host run does on a
        # shared filesystem
        ckpt = os.path.join(os.path.dirname(os.path.abspath(out)),
                            "dist_ckpt", "state.npz")
        payload = run(train.shard_for_process(), val.shard_for_process(),
                      test.shard_for_process(), GLOBAL_BATCH // 2,
                      mesh, model, test_rows, ckpt_path=ckpt)
        payload["process_index"] = jax.process_index()
    else:
        out = sys.argv[2]
        assert jax.device_count() == 8
        train, val, test, test_rows = build_datasets()
        model, mesh = build_model_and_mesh()
        shard = lambda ds: [ds.shard_for_process(i, 2) for i in (0, 1)]  # noqa: E731
        ckpt = os.path.join(os.path.dirname(os.path.abspath(out)),
                            "single_ckpt", "state.npz")
        payload = run(ZippedShards(shard(train)), ZippedShards(shard(val)),
                      ZippedShards(shard(test)), GLOBAL_BATCH,
                      mesh, model, test_rows, ckpt_path=ckpt)
    with open(out, "w") as f:
        json.dump(payload, f)
    print("WORKER_DONE", mode, flush=True)


if __name__ == "__main__":
    main()
