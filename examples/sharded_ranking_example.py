"""Full-vocab ranking on a vocab-sharded table (SURVEY.md §7 hard part 3).

Demonstrates the round-2 sharded serving path: a Reddit-scale vocab is
sharded 8-way over the 'model' mesh axis, and `BERT4RecModel.rank_top_k`
ranks the whole vocabulary per masked position via per-shard
``lax.top_k`` + merge — the ``[B, P, V]`` logits are never gathered.

Runs anywhere: on CPU, set

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

(the tests' conftest does the same; see tests/test_end_to_end.py for the
asserted equality against the dense ranking).
"""

import numpy as np

import jax
import jax.numpy as jnp

from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
from bert4rec_tpu.core.partitioning import param_shardings
from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel


def main():
    vocab_size = 335_423  # Reddit: 335,420 items + [PAD]/[MASK]/[UNK]
    n_dev = jax.device_count()
    mesh = create_mesh(MeshConfig(model_parallelism=n_dev))

    model = BERT4RecModel(config=BERT4RecConfig(
        vocab_size=vocab_size, hidden_size=128, num_layers=2,
        num_attention_heads=4, inner_dim=512, max_sequence_length=200,
        max_predictions_per_seq=40,
        vocab_pad_to=1024))  # pad V so it divides the 'model' axis
    params = model.init(jax.random.key(0))
    params = jax.device_put(params, param_shardings(mesh, params))

    rng = np.random.default_rng(0)
    batch = {
        "input_word_ids": jnp.asarray(
            rng.integers(3, vocab_size, size=(4, 200)).astype(np.int32)),
        "input_mask": jnp.ones((4, 200), jnp.int32),
        "masked_lm_positions": jnp.asarray(
            [[0, 1], [2, 3], [4, 5], [6, 7]], jnp.int32),
    }

    # per-shard top-k + merge; exclude e.g. the special tokens per row
    exclude = jnp.asarray(np.tile([0, 1, 2, -1], (4, 1)), jnp.int32)
    top_ids, top_probs = jax.jit(
        lambda p, b: model.rank_top_k(p, b, 10, mesh=mesh, exclude=exclude,
                                      with_probabilities=True))(params, batch)
    print("top-10 ids per position:", np.asarray(top_ids)[0, 0])
    print("their probabilities:", np.asarray(top_probs)[0, 0])


if __name__ == "__main__":
    main()
