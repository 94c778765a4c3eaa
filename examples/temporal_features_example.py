"""Temporal features: aligned per-item timestamps through the pipeline
(reference BERT4RecTemporalPreprocessor,
bert4rec_temporal_preprocessor.py:59-160). The feature dict gains an
``input_timestamps`` column truncated/padded in lockstep with the items."""

import numpy as np
import pandas as pd

from bert4rec_tpu.dataloaders import BERT4RecDataloader, preprocessors
from bert4rec_tpu.dataloaders import dataloader_utils as utils


def main():
    rng = np.random.default_rng(0)
    rows = []
    for uid in range(20):
        t = rng.integers(1_500_000_000, 1_600_000_000)
        for _ in range(int(rng.integers(5, 15))):
            rows.append((uid, f"item_{rng.integers(0, 30)}", int(t)))
            t += int(rng.integers(60, 86400))
    df = pd.DataFrame(rows, columns=["uid", "item", "timestamp"])

    class InlineSource:
        @classmethod
        def load_data(cls):
            return df

    dataloader = BERT4RecDataloader(
        max_seq_len=16, max_predictions_per_seq=4,
        data_source=InlineSource,
        preprocessor=preprocessors.BERT4RecTemporalPreprocessor)
    dataloader.generate_vocab(sorted(set(df["item"])))

    train, val, test = dataloader.get_data(
        sort_by="timestamp", group_by="uid",
        extract_data=["item", "timestamp"], finetuning_split=0.1)

    batch = next(train.batches(8, seed=0))
    print("feature keys:", sorted(batch.keys()))
    assert "input_timestamps" in batch
    print("input_timestamps:", batch["input_timestamps"].shape,
          batch["input_timestamps"].dtype)
    # timestamps align with items: padded exactly where items are padded
    pad = batch["input_word_ids"] == 0
    assert (batch["input_timestamps"][pad] == 0).all()
    print("timestamps aligned with item padding: OK")

    # single-sequence inference appends the current time for the [UNK] slot
    items = df[df.uid == 0].sort_values("timestamp")["item"].tolist()
    ts = df[df.uid == 0].sort_values("timestamp")["timestamp"].tolist()
    model_input = dataloader.preprocessor.prepare_inference(items, ts)
    print("inference features:", {k: v.shape for k, v in model_input.items()})

    # beyond parity: a model that CONSUMES the timestamps — learned
    # recency-bucket embeddings (the reference ships the temporal
    # preprocessor but no model uses it)
    import jax
    from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
    model = BERT4RecModel(config=BERT4RecConfig(
        vocab_size=dataloader.tokenizer.get_vocab_size(), hidden_size=32,
        num_layers=1, num_attention_heads=4, inner_dim=64,
        max_sequence_length=dataloader._MAX_SEQ_LENGTH,
        max_predictions_per_seq=dataloader._MAX_PREDICTIONS_PER_SEQ,
        use_temporal_embeddings=True))
    params = model.init(jax.random.key(0))
    out = model.apply(params, batch)
    print("temporal model mlm_logits:", out["mlm_logits"].shape)

    # and TiSASRec-style relative time-interval ATTENTION: a learned
    # per-head bias over signed log2 time-delta buckets between every
    # query/key event pair (zero-initialized — exact no-op until trained)
    model_ta = BERT4RecModel(config=BERT4RecConfig(
        vocab_size=dataloader.tokenizer.get_vocab_size(), hidden_size=32,
        num_layers=1, num_attention_heads=4, inner_dim=64,
        max_sequence_length=dataloader._MAX_SEQ_LENGTH,
        max_predictions_per_seq=dataloader._MAX_PREDICTIONS_PER_SEQ,
        use_temporal_attention=True))
    params_ta = model_ta.init(jax.random.key(0))
    out_ta = model_ta.apply(params_ta, batch)
    print("temporal-attention mlm_logits:", out_ta["mlm_logits"].shape)


if __name__ == "__main__":
    main()
