"""Preprocessor output contracts (reference preprocessors_tests/*)."""

import numpy as np
import pytest

from bert4rec_tpu import tokenizers
from bert4rec_tpu.dataloaders import preprocessors
from bert4rec_tpu.dataloaders.sequence_dataset import SequenceDataset
from tests import test_utils

MAX_SEQ = 16
MAX_PRED = 4


@pytest.fixture
def prep():
    tok = tokenizers.get("simple")
    tok.tokenize(["[PAD]", "[MASK]", "[UNK]"])  # ids 0,1,2
    p = preprocessors.get("bert4rec")
    p.set_properties(tokenizer=tok, max_seq_len=MAX_SEQ,
                     max_predictions_per_seq=MAX_PRED,
                     mask_token_id=1, unk_token_id=2, pad_token_id=0,
                     masked_lm_rate=0.3, mask_token_rate=1.0,
                     random_token_rate=0.0)
    return p


EXPECTED_MLM_KEYS = {"labels", "input_word_ids", "input_mask",
                     "masked_lm_ids", "masked_lm_positions",
                     "masked_lm_weights"}


def test_factory():
    assert isinstance(preprocessors.get("bert4rec"),
                      preprocessors.BERT4RecPreprocessor)
    assert isinstance(preprocessors.get("bert4rec_temporal"),
                      preprocessors.BERT4RecTemporalPreprocessor)
    with pytest.raises(ValueError):
        preprocessors.get("nope")


def test_set_properties_partial_update(prep):
    prep.set_properties(max_seq_len=99)
    assert prep.max_seq_len == 99
    assert prep.max_predictions_per_seq == MAX_PRED  # untouched


def test_process_element_keys_shapes_padding(prep):
    features = prep.process_element(list("abcdefgh"), apply_mlm=True,
                                    finetuning=False)
    assert set(features.keys()) == EXPECTED_MLM_KEYS
    assert features["input_word_ids"].shape == (MAX_SEQ,)
    assert features["labels"].shape == (MAX_SEQ,)
    assert features["input_mask"].shape == (MAX_SEQ,)
    assert features["masked_lm_ids"].shape == (MAX_PRED,)
    assert features["masked_lm_positions"].shape == (MAX_PRED,)
    assert features["masked_lm_weights"].shape == (MAX_PRED,)
    # 8 real tokens, rest padded
    np.testing.assert_array_equal(features["input_mask"][:8], 1)
    np.testing.assert_array_equal(features["input_mask"][8:], 0)
    np.testing.assert_array_equal(features["labels"][8:], 0)


def test_process_element_no_mlm(prep):
    features = prep.process_element(list("abc"), apply_mlm=False,
                                    finetuning=False)
    assert set(features.keys()) == {"labels", "input_word_ids", "input_mask"}
    # without mlm the input is the unmasked sequence
    np.testing.assert_array_equal(features["input_word_ids"],
                                  features["labels"])


def test_process_element_finetuning_masks_last(prep):
    features = prep.process_element(list("abcde"), apply_mlm=True,
                                    finetuning=True)
    assert features["masked_lm_weights"].sum() == 1
    assert features["masked_lm_positions"][0] == 4
    assert features["input_word_ids"][4] == 1  # [MASK]
    assert features["masked_lm_ids"][0] == features["labels"][4]


def test_truncation_tail_for_finetuning(prep):
    seq = [f"item{i}" for i in range(40)]
    features = prep.process_element(seq, apply_mlm=True, finetuning=True)
    expected_tail = prep.tokenizer.tokenize(seq)[-MAX_SEQ:]
    np.testing.assert_array_equal(features["labels"], expected_tail)


def test_process_dataset_materializes_batch(prep):
    ds = test_utils.generate_random_sequence_dataset(20, 5, 30, seed=0)
    processed = prep.process_dataset(ds, apply_mlm=True, finetuning=False)
    assert processed.cardinality() == 20
    features = processed.materialize(seed=0)
    assert features["input_word_ids"].shape == (20, MAX_SEQ)
    assert features["masked_lm_ids"].shape == (20, MAX_PRED)
    # every row has at least one prediction
    assert (features["masked_lm_weights"].sum(axis=1) >= 1).all()


def test_remasking_differs_across_epochs(prep):
    ds = test_utils.generate_random_sequence_dataset(50, 10, 15, seed=1)
    processed = prep.process_dataset(ds, apply_mlm=True, finetuning=False)
    a = processed.materialize(seed=0)
    b = processed.materialize(seed=1)
    assert not np.array_equal(a["masked_lm_positions"],
                              b["masked_lm_positions"])
    # same seed -> identical (deterministic resume)
    a2 = processed.materialize(seed=0)
    np.testing.assert_array_equal(a["input_word_ids"], a2["input_word_ids"])


def test_prepare_inference(prep):
    seq = [f"item{i}" for i in range(5)]
    prep.tokenizer.tokenize(seq)
    features = prep.prepare_inference(seq)
    # batch dim added
    assert features["input_word_ids"].shape == (1, MAX_SEQ)
    # placeholder [UNK] appended then masked: 6 tokens, last is [MASK]
    assert features["input_mask"][0].sum() == 6
    assert features["input_word_ids"][0, 5] == 1
    with pytest.raises(ValueError):
        prep.prepare_inference("not a list")


def test_temporal_preprocessor_alignment():
    tok = tokenizers.get("simple")
    tok.tokenize(["[PAD]", "[MASK]", "[UNK]"])
    p = preprocessors.get("bert4rec_temporal")
    p.set_properties(tokenizer=tok, max_seq_len=8, max_predictions_per_seq=2,
                     mask_token_id=1, unk_token_id=2, pad_token_id=0,
                     masked_lm_rate=0.2, mask_token_rate=1.0,
                     random_token_rate=0.0)
    seqs = [["a", "b", "c"], ["d", "e", "f", "g"]]
    ts = [[10, 20, 30], [1, 2, 3, 4]]
    ds = SequenceDataset(seqs, {"timestamps": ts})
    processed = p.process_dataset(ds, apply_mlm=True, finetuning=False)
    features = processed.materialize(seed=0)
    assert features["input_timestamps"].shape == (2, 8)
    np.testing.assert_array_equal(features["input_timestamps"][0, :3],
                                  [10, 20, 30])
    np.testing.assert_array_equal(features["input_timestamps"][0, 3:], 0)

    # inference appends a current timestamp
    inf = p.prepare_inference(["a", "b"], timestamps=[5, 6])
    assert inf["input_timestamps"].shape[0] == 1
    assert inf["input_timestamps"][0, 2] > 0


def test_temporal_through_dataloader_get_data():
    """End-to-end: extract_data=["item", "timestamp"] produces aligned
    input_timestamps through the generic dataloader."""
    import numpy as np
    import pandas as pd
    from bert4rec_tpu.dataloaders import BERT4RecDataloader

    rng = np.random.default_rng(0)
    rows = []
    for uid in range(15):
        t = 1_500_000_000
        for _ in range(int(rng.integers(5, 12))):
            rows.append((uid, f"item_{rng.integers(0, 20)}", t))
            t += int(rng.integers(60, 86400))
    df = pd.DataFrame(rows, columns=["uid", "item", "timestamp"])

    class InlineSource:
        @classmethod
        def load_data(cls):
            return df

    dataloader = BERT4RecDataloader(
        max_seq_len=12, max_predictions_per_seq=3,
        data_source=InlineSource,
        preprocessor=preprocessors.BERT4RecTemporalPreprocessor)
    dataloader.generate_vocab(sorted(set(df["item"])))
    train, val, test = dataloader.get_data(
        sort_by="timestamp", group_by="uid",
        extract_data=["item", "timestamp"])
    batch = next(train.batches(4, seed=0))
    assert "input_timestamps" in batch
    assert batch["input_timestamps"].shape == batch["input_word_ids"].shape
    pad = batch["input_word_ids"] == 0
    assert (batch["input_timestamps"][pad] == 0).all()
    real = ~pad
    assert (batch["input_timestamps"][real] >= 1_500_000_000).all()


def test_prepare_inference_batch_matches_per_element():
    """The vectorized serving prep must equal per-history prepare_inference
    row-for-row (last-token masking is deterministic)."""
    from bert4rec_tpu.dataloaders import BERT4RecDataloader
    dl = BERT4RecDataloader(max_seq_len=8, max_predictions_per_seq=2)
    vocab = [f"w{i}" for i in range(20)]
    dl.generate_vocab(vocab)
    histories = [vocab[:3], vocab[5:11], vocab[2:12]]  # incl. over-long
    batched = dl.prepare_inference_batch(histories)
    for i, h in enumerate(histories):
        single = dl.prepare_inference(list(h))
        for k, v in single.items():
            np.testing.assert_array_equal(batched[k][i], v[0], err_msg=k)
