"""Walk through one train step's loss math on a tiny synthetic batch
(reference examples/loss_calculation_example.py): forward -> MLM logits ->
masked sparse categorical cross-entropy (pad label 0 excluded)."""

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
from bert4rec_tpu.trainers import trainer_utils


def main():
    vocab_size, seq_len, n_pred = 50, 12, 3
    config = BERT4RecConfig(vocab_size=vocab_size, hidden_size=32,
                            num_layers=2, num_attention_heads=4, inner_dim=64,
                            max_sequence_length=seq_len,
                            max_predictions_per_seq=n_pred)
    model = BERT4RecModel(config=config)
    params = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    ids = rng.integers(3, vocab_size, size=(2, seq_len)).astype(np.int32)
    positions = np.array([[1, 4, 7], [0, 3, 0]], dtype=np.int32)
    gt = np.take_along_axis(ids, positions, axis=1)
    gt[1, 2] = 0  # padded prediction slot: excluded from the loss
    batch = {
        "input_word_ids": ids,
        "input_mask": np.ones((2, seq_len), np.int32),
        "masked_lm_positions": positions,
        "masked_lm_ids": gt,
        "masked_lm_weights": (gt != 0).astype(np.int32),
    }

    outputs = model.apply(params, batch)
    logits = outputs["mlm_logits"]
    print("mlm_logits:", logits.shape)

    loss = trainer_utils.masked_sparse_categorical_crossentropy(
        jnp.asarray(gt), logits)
    acc = trainer_utils.masked_accuracy(jnp.asarray(gt), logits)
    print(f"masked SCCE loss = {float(loss):.4f} "
          f"(over {int((gt != 0).sum())} unmasked positions)")
    print(f"masked accuracy  = {float(acc):.4f}")

    # the same numbers by hand
    logp = jax.nn.log_softmax(logits, axis=-1)
    mask = gt != 0
    nll = -np.take_along_axis(np.asarray(logp), gt[..., None], axis=-1)[..., 0]
    print(f"manual loss      = {nll[mask].mean():.4f}")


if __name__ == "__main__":
    main()
