"""Worker for the kill-and-resume test (tests/trainers_tests/
test_crash_resume.py). Not collected by pytest.

Trains a deterministic synthetic run with per-epoch checkpointing
(``ModelCheckpoint(save_best_only=False)``) and auto-resume. Modes:

- ``run <ckpt> <out.json> <epochs> [<kill_file> <kill_after_epoch>]``:
  train; if a kill file is given, touch it after finishing epoch
  ``kill_after_epoch`` (the parent SIGKILLs this process when it appears).
  On a restart the trainer auto-resumes from the checkpoint's epoch.

Writes final-params checksums + history to ``out.json`` on completion.
"""

import hashlib
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

VOCAB = 53
SEQ = 12
SEED = 11


def build_dataset():
    from bert4rec_tpu.dataloaders.processed_dataset import (
        MaskingConfig, ProcessedDataset,
    )
    rng = np.random.default_rng(3)
    seqs = [((np.arange(int(rng.integers(6, SEQ + 1)))
              + int(rng.integers(0, VOCAB - 3))) % (VOCAB - 3) + 3)
            .astype(np.int32) for _ in range(96)]
    cfg = MaskingConfig(max_seq_len=SEQ, max_predictions_per_seq=3,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.3)
    return ProcessedDataset(seqs, cfg, lambda: VOCAB)


def main():
    argv = sys.argv[2:] if sys.argv[1] == "run" else sys.argv[1:]
    ckpt, out, epochs = argv[0], argv[1], int(argv[2])
    kill_file = argv[3] if len(argv) > 3 else None
    kill_after = int(argv[4]) if len(argv) > 4 else -1

    from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
    from bert4rec_tpu.trainers import BERT4RecTrainer
    from bert4rec_tpu.trainers.callbacks import Callback, ModelCheckpoint

    model = BERT4RecModel(config=BERT4RecConfig(
        vocab_size=VOCAB, hidden_size=32, num_layers=1,
        num_attention_heads=2, inner_dim=64, max_sequence_length=SEQ,
        max_predictions_per_seq=3))
    trainer = BERT4RecTrainer(model)
    trainer.initialize_model(rng=jax.random.key(SEED))

    class KillSignal(Callback):
        """After epoch N's checkpoint is on disk, tell the parent to
        SIGKILL us — then stall so the kill lands mid-'epoch N+1'."""

        def on_epoch_end(self, cb_trainer, epoch, logs):
            if kill_file and epoch == kill_after:
                with open(kill_file, "w") as f:
                    f.write(str(epoch))
                import time
                time.sleep(60)  # parent kills us here

    # save EVERY epoch (not best-only) so resume continues from the last
    # completed epoch deterministically
    trainer.append_callback(ModelCheckpoint(ckpt, save_best_only=False,
                                            verbose=False))
    trainer.append_callback(KillSignal())
    history = trainer.train(build_dataset(), checkpoint_path=ckpt,
                            epochs=epochs, batch_size=32, seed=SEED,
                            verbose=False)

    digests = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            trainer.state["params"])[0]:
        digests["/".join(str(getattr(k, "key", k)) for k in path)] = \
            hashlib.sha256(np.ascontiguousarray(
                np.asarray(leaf)).tobytes()).hexdigest()
    with open(out, "w") as f:
        json.dump({"step": int(trainer.state["step"]),
                   "digests": digests,
                   "loss": [float(x)
                            for x in history.history.get("loss", [])]}, f)
    print("WORKER_DONE", flush=True)


if __name__ == "__main__":
    main()
