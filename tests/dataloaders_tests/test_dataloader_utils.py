"""LOO split, masking semantics, batching (contracts from reference
tests/datalaoders_tests/dataloader_utils_tests.py)."""

import numpy as np
import pandas as pd
import pytest

from bert4rec_tpu.dataloaders import dataloader_utils as utils
from bert4rec_tpu.dataloaders.sequence_dataset import SequenceDataset, split_dataset


# --------------------------------------------------------------------------- #
# popularity / sequence building
# --------------------------------------------------------------------------- #

def test_rank_items_by_popularity():
    items = ["a", "b", "b", "c", "c", "c"]
    assert utils.rank_items_by_popularity(items) == ["c", "b", "a"]


def test_make_sequence_df():
    df = pd.DataFrame({"user": [1, 1, 2, 2, 2], "item": list("abcde")})
    seq_df = utils.make_sequence_df(df, "user", ["item"])
    assert len(seq_df) == 2
    # cells are numpy arrays (vectorized grouping); values are what counts
    assert [list(s) for s in seq_df["item"]] == [["a", "b"],
                                                 ["c", "d", "e"]]


def test_make_sequence_df_min_length():
    df = pd.DataFrame({"user": [1, 1, 2, 2, 2], "item": list("abcde")})
    seq_df = utils.make_sequence_df(df, "user", ["item"], min_sequence_length=3)
    assert len(seq_df) == 1


def test_split_sequence_df_loo_protocol():
    df = pd.DataFrame({
        "user": [1] * 6 + [2] * 3,
        "item": list("abcdef") + list("xyz"),
    })
    train, val, test = utils.split_sequence_df(df, "user", ["item"],
                                               min_sequence_length=5)
    # user 1: long enough -> LOO split
    assert list(train["item"][0]) == list("abcd")
    assert list(val["item"][0]) == list("abcde")
    assert list(test["item"][0]) == list("abcdef")
    # user 2: too short -> whole sequence in train only
    assert list(train["item"][1]) == list("xyz")
    assert len(val) == 1 and len(test) == 1


def test_split_sequence_df_bad_columns():
    df = pd.DataFrame({"user": [1], "item": ["a"]})
    with pytest.raises(ValueError):
        utils.split_sequence_df(df, "nope", ["item"])
    with pytest.raises(ValueError):
        utils.split_sequence_df(df, "user", ["nope"])


def test_duplicate_dataset():
    ds = SequenceDataset([[1, 2], [3]])
    assert len(utils.duplicate_dataset(ds, 3)) == 6
    with pytest.raises(ValueError):
        utils.duplicate_dataset(ds, 0)


def test_split_dataset_fractions():
    ds = SequenceDataset([[i] for i in range(100)])
    train, val, test = split_dataset(ds, 0.8, 0.1, 0.1, seed=12)
    assert (len(train), len(val), len(test)) == (80, 10, 10)
    # deterministic under the same seed
    train2, _, _ = split_dataset(ds, 0.8, 0.1, 0.1, seed=12)
    assert train.sequences == train2.sequences
    with pytest.raises(ValueError):
        split_dataset(ds, 0.5, 0.1, 0.1)


# --------------------------------------------------------------------------- #
# truncation / padding
# --------------------------------------------------------------------------- #

def test_pad_sequences():
    padded, lengths = utils.pad_sequences([[1, 2, 3], [4]], max_len=5)
    np.testing.assert_array_equal(padded,
                                  [[1, 2, 3, 0, 0], [4, 0, 0, 0, 0]])
    np.testing.assert_array_equal(lengths, [3, 1])
    with pytest.raises(ValueError):
        utils.pad_sequences([[1, 2, 3]], max_len=2)


def test_truncate_sequences_tail_window():
    rng = np.random.default_rng(0)
    out = utils.truncate_sequences([np.arange(10)], 4, rng, tail_window=True)
    np.testing.assert_array_equal(out[0], [6, 7, 8, 9])


def test_truncate_sequences_random_window_is_contiguous():
    rng = np.random.default_rng(0)
    for _ in range(20):
        (w,) = utils.truncate_sequences([np.arange(100)], 10, rng)
        assert len(w) == 10
        np.testing.assert_array_equal(np.diff(w), 1)


# --------------------------------------------------------------------------- #
# dynamic masking — statistical & structural contracts
# --------------------------------------------------------------------------- #

VOCAB_SIZE = 50
SPECIAL = [0, 2]  # pad, unk
MASK_ID = 1


def test_masking_single_sequence_parity_api():
    seq = np.arange(3, 23, dtype=np.int64)  # 20 items, no specials
    masked, positions, ids = utils.apply_dynamic_masking_task(
        seq, max_selections_per_seq=5, mask_token_id=MASK_ID,
        special_token_ids=SPECIAL, vocab_size=VOCAB_SIZE,
        selection_rate=0.2, mask_token_rate=1.0, random_token_rate=0.0,
        seed=42)
    # num_to_predict = min(5, max(1, int(20*0.2))) = 4
    assert len(positions) == 4 and len(ids) == 4
    assert np.all(np.diff(positions) > 0)  # ascending
    np.testing.assert_array_equal(masked[positions], MASK_ID)
    np.testing.assert_array_equal(ids, seq[positions])
    # non-selected positions untouched
    untouched = np.setdiff1d(np.arange(20), positions)
    np.testing.assert_array_equal(masked[untouched], seq[untouched])


def test_masking_num_to_predict_bounds():
    rng = np.random.default_rng(0)
    # very short sequence -> at least 1 prediction
    seq = np.array([[5, 6, 0, 0]], dtype=np.int32)
    out = utils.apply_dynamic_masking_batch(
        seq, np.array([2]), 10, MASK_ID, SPECIAL, VOCAB_SIZE, rng,
        selection_rate=0.1, mask_token_rate=1.0, random_token_rate=0.0)
    assert out["masked_lm_weights"].sum() == 1
    # long sequence capped at max_selections
    seq = np.arange(3, 43, dtype=np.int32)[None, :]
    out = utils.apply_dynamic_masking_batch(
        seq, np.array([40]), 3, MASK_ID, SPECIAL, VOCAB_SIZE, rng,
        selection_rate=0.9, mask_token_rate=1.0, random_token_rate=0.0)
    assert out["masked_lm_weights"].sum() == 3


def test_masking_never_selects_special_or_padding():
    rng = np.random.default_rng(1)
    seq = np.array([[0, 5, 2, 6, 7, 0, 0, 0]], dtype=np.int32)
    out = utils.apply_dynamic_masking_batch(
        seq, np.array([5]), 8, MASK_ID, SPECIAL, VOCAB_SIZE, rng,
        selection_rate=1.0, mask_token_rate=1.0, random_token_rate=0.0)
    w = out["masked_lm_weights"][0].astype(bool)
    pos = out["masked_lm_positions"][0][w]
    assert set(pos.tolist()) == {1, 3, 4}  # only the non-special positions


def test_masking_random_token_rate():
    rng = np.random.default_rng(2)
    n, s = 200, 20
    seq = np.full((n, s), 10, dtype=np.int32)
    out = utils.apply_dynamic_masking_batch(
        seq, np.full(n, s), s, MASK_ID, SPECIAL, VOCAB_SIZE, rng,
        selection_rate=1.0, mask_token_rate=0.8, random_token_rate=0.1)
    sel = out["masked_lm_weights"].astype(bool)
    # gather replaced tokens at selected positions
    pos = out["masked_lm_positions"]
    rows = np.arange(n)[:, None].repeat(pos.shape[1], 1)
    vals = out["input_word_ids"][rows[sel], pos[sel]]
    frac_mask = (vals == MASK_ID).mean()
    frac_rand = ((vals != MASK_ID) & (vals != 10)).mean()
    frac_keep = (vals == 10).mean()
    assert abs(frac_mask - 0.8) < 0.05
    assert frac_rand < 0.15
    assert abs(frac_keep - 0.1) < 0.05  # keep-original ~= 1-0.8-0.1 (+ random hits 10 rarely)
    # random tokens never special
    assert not np.isin(vals, SPECIAL).any()


def test_masking_deterministic_under_seed():
    seq = np.arange(3, 33, dtype=np.int32)[None, :].repeat(4, 0)
    lengths = np.full(4, 30)
    a = utils.apply_dynamic_masking_batch(
        seq, lengths, 10, MASK_ID, SPECIAL, VOCAB_SIZE,
        np.random.default_rng(7), 0.2, 1.0, 0.0)
    b = utils.apply_dynamic_masking_batch(
        seq, lengths, 10, MASK_ID, SPECIAL, VOCAB_SIZE,
        np.random.default_rng(7), 0.2, 1.0, 0.0)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_mask_last_token_only():
    seq = np.array([5, 6, 7], dtype=np.int64)
    masked, positions, ids = utils.mask_last_token_only(seq, MASK_ID)
    np.testing.assert_array_equal(masked, [5, 6, MASK_ID])
    np.testing.assert_array_equal(positions, [2])
    np.testing.assert_array_equal(ids, [7])


def test_masking_finetuning_rows():
    rng = np.random.default_rng(3)
    seq = np.array([[5, 6, 7, 0], [8, 9, 10, 11]], dtype=np.int32)
    out = utils.apply_dynamic_masking_batch(
        seq, np.array([3, 4]), 4, MASK_ID, SPECIAL, VOCAB_SIZE, rng,
        selection_rate=0.5, mask_token_rate=1.0, random_token_rate=0.0,
        finetuning=np.array([True, False]))
    # finetuning row: exactly last position masked
    assert out["masked_lm_weights"][0].sum() == 1
    assert out["masked_lm_positions"][0][0] == 2
    assert out["masked_lm_ids"][0][0] == 7
    assert out["input_word_ids"][0, 2] == MASK_ID


# --------------------------------------------------------------------------- #
# batching
# --------------------------------------------------------------------------- #

def test_make_batches_shapes_and_remainder():
    feats = {"x": np.arange(10)[:, None].repeat(3, 1)}
    batches = list(utils.make_batches(feats, batch_size=4, shuffle=False))
    assert [len(b["x"]) for b in batches] == [4, 4, 2]
    batches = list(utils.make_batches(feats, batch_size=4, shuffle=False,
                                      drop_remainder=True))
    assert [len(b["x"]) for b in batches] == [4, 4]


def test_make_batches_pad_final():
    feats = {"x": np.arange(6)[:, None]}
    batches = list(utils.make_batches(feats, batch_size=4, shuffle=False,
                                      pad_final_batch=True))
    assert all(len(b["x"]) == 4 for b in batches)
    np.testing.assert_array_equal(batches[-1]["example_weights"], [1, 1, 0, 0])


def test_make_batches_reshuffles_per_call():
    feats = {"x": np.arange(100)}
    a = np.concatenate([b["x"] for b in utils.make_batches(feats, 10, seed=1)])
    b = np.concatenate([b["x"] for b in utils.make_batches(feats, 10, seed=2)])
    assert not np.array_equal(a, b)
    a2 = np.concatenate([b["x"] for b in utils.make_batches(feats, 10, seed=1)])
    np.testing.assert_array_equal(a, a2)


def test_group_sequences_drops_nan_keys_like_groupby():
    df = pd.DataFrame({"user": [1.0, np.nan, 1.0, 2.0],
                       "item": list("abcd")})
    out = utils.group_sequences(df, "user", ["item"])
    assert [list(s) for s in out["item"]] == [["a", "c"], ["d"]]
    all_nan = pd.DataFrame({"user": [np.nan], "item": ["a"]})
    assert utils.group_sequences(all_nan, "user", ["item"]) == {"item": []}
