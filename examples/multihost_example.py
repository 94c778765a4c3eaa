"""Multi-host training launch.

Run one copy of this script per host (the reference has no distributed
story at all — SURVEY.md §2.9):

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=<i> python -m examples.multihost_example

Each process feeds its LOCAL shard of the global batch; the trainer
assembles distributed global arrays (jax.make_array_from_process_local_data)
and GSPMD runs the step data-parallel across all hosts' chips with the
item-embedding table sharded over the 'model' axis.
"""

import numpy as np

import jax

from bert4rec_tpu.core.mesh import MeshConfig, create_mesh, distributed_initialize
from bert4rec_tpu.dataloaders.processed_dataset import MaskingConfig, ProcessedDataset
from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
from bert4rec_tpu.trainers import BERT4RecTrainer


def main():
    distributed_initialize()  # no-op when run single-process
    n_proc = jax.process_count()
    mesh = create_mesh(MeshConfig(model_parallelism=1))
    print(f"process {jax.process_index()}/{n_proc}: "
          f"{jax.local_device_count()} local / {jax.device_count()} global "
          f"devices, mesh {dict(mesh.shape)}")

    vocab_size = 1000
    model = BERT4RecModel(config=BERT4RecConfig(
        vocab_size=vocab_size, hidden_size=64, num_layers=2,
        num_attention_heads=2, inner_dim=256, max_sequence_length=32,
        max_predictions_per_seq=8,
        vocab_pad_to=jax.device_count()))
    trainer = BERT4RecTrainer(model, mesh=mesh)
    trainer.initialize_model(rng=jax.random.key(0))

    # every host builds the SAME (synthetic) dataset, then takes its
    # disjoint equal-size slice — shard_for_process is the supported API
    # for per-host data (tested in tests/test_multihost.py)
    rng = np.random.default_rng(0)
    seqs = [rng.integers(3, vocab_size, size=int(rng.integers(8, 32)))
            .astype(np.int32) for _ in range(512 * n_proc)]
    cfg = MaskingConfig(max_seq_len=32, max_predictions_per_seq=8,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.2)
    ds = ProcessedDataset(seqs, cfg, lambda: vocab_size).shard_for_process()

    # local batch size: the global batch is n_proc * 64
    history = trainer.train(ds, epochs=2, batch_size=64)
    print("final loss:", history.history["loss"][-1])


if __name__ == "__main__":
    main()
