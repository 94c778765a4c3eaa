"""Native (C++) masking engine tests: structural contract identical to the
numpy implementation, deterministic per seed, unbiased rates."""

import numpy as np
import pytest

from bert4rec_tpu.dataloaders import native
from bert4rec_tpu.dataloaders import dataloader_utils as utils

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")

VOCAB = 100
SPECIALS = [0, 1, 2]
MASK_ID = 1
S, P = 24, 6


def make_batch(n=64, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, S + 1, size=n).astype(np.int32)
    ids = rng.integers(3, VOCAB, size=(n, S)).astype(np.int32)
    ids[np.arange(S)[None, :] >= lengths[:, None]] = 0
    return ids, lengths


def run_native(ids, lengths, seed=7, finetuning=None, **kw):
    defaults = dict(selection_rate=0.3, mask_token_rate=0.8,
                    random_token_rate=0.1)
    defaults.update(kw)
    return native.apply_dynamic_masking_batch_native(
        ids, lengths, P, MASK_ID, SPECIALS, VOCAB, seed,
        finetuning=finetuning, **defaults)


class TestNativeMasking:

    def test_structural_contract(self):
        ids, lengths = make_batch()
        out = run_native(ids, lengths)
        n = len(ids)
        for key, shape in [("input_word_ids", (n, S)),
                           ("masked_lm_positions", (n, P)),
                           ("masked_lm_ids", (n, P)),
                           ("masked_lm_weights", (n, P))]:
            assert out[key].shape == shape and out[key].dtype == np.int32

        w = out["masked_lm_weights"].astype(bool)
        # weights are a prefix per row
        assert (np.diff(w.astype(int), axis=1) <= 0).all()
        # num_to_predict = min(P, max(1, n_valid * rate))
        n_valid = (ids >= 3).sum(axis=1)
        expected = np.minimum(P, np.maximum(1, (n_valid * 0.3).astype(int)))
        expected = np.where(n_valid == 0, 0, expected)
        np.testing.assert_array_equal(w.sum(axis=1), expected)
        # selected positions: valid, ascending, within length
        for i in range(n):
            pos = out["masked_lm_positions"][i][w[i]]
            assert (np.diff(pos) > 0).all()
            assert (pos < lengths[i]).all()
            np.testing.assert_array_equal(out["masked_lm_ids"][i][w[i]],
                                          ids[i][pos])
        # non-selected positions unchanged
        changed = out["input_word_ids"] != ids
        sel_mask = np.zeros_like(ids, dtype=bool)
        rows, slots = np.nonzero(w)
        sel_mask[rows, out["masked_lm_positions"][rows, slots]] = True
        assert (~changed | sel_mask).all()

    def test_deterministic_per_seed(self):
        ids, lengths = make_batch()
        a = run_native(ids, lengths, seed=5)
        b = run_native(ids, lengths, seed=5)
        c = run_native(ids, lengths, seed=6)
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])
        assert any(not np.array_equal(a[k], c[k]) for k in a)

    def test_threading_does_not_change_results(self):
        ids, lengths = make_batch(n=1024)
        a = run_native(ids, lengths, seed=5, n_threads=1)
        b = run_native(ids, lengths, seed=5, n_threads=8)
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])

    def test_replacement_rates(self):
        ids, lengths = make_batch(n=2000, seed=3)
        out = run_native(ids, lengths, seed=9, selection_rate=0.5,
                         mask_token_rate=0.8, random_token_rate=0.1)
        w = out["masked_lm_weights"].astype(bool)
        rows, slots = np.nonzero(w)
        pos = out["masked_lm_positions"][rows, slots]
        new = out["input_word_ids"][rows, pos]
        orig = ids[rows, pos]
        n_sel = len(rows)
        frac_mask = (new == MASK_ID).mean()
        frac_keep = (new == orig).mean()
        assert abs(frac_mask - 0.8) < 0.03, frac_mask
        # keep-rate ~0.1 (+ tiny prob a random draw equals the original)
        assert abs(frac_keep - 0.1) < 0.03, frac_keep
        # random replacements are never special tokens
        replaced = new[(new != MASK_ID) & (new != orig)]
        assert not np.isin(replaced, SPECIALS).any()
        assert n_sel > 0

    def test_finetuning_masks_last_token_only(self):
        ids, lengths = make_batch()
        ft = np.ones(len(ids), dtype=bool)
        out = run_native(ids, lengths, finetuning=ft)
        w = out["masked_lm_weights"]
        np.testing.assert_array_equal(w.sum(axis=1),
                                      (lengths > 0).astype(np.int32))
        for i in range(len(ids)):
            if lengths[i] > 0:
                assert out["masked_lm_positions"][i, 0] == lengths[i] - 1
                assert out["input_word_ids"][i, lengths[i] - 1] == MASK_ID
                assert out["masked_lm_ids"][i, 0] == ids[i, lengths[i] - 1]

    def test_numpy_and_native_same_distribution(self):
        """Marginal selection frequency per position agrees between the two
        engines (different streams, same distribution)."""
        ids, lengths = make_batch(n=4000, seed=1)
        rng = np.random.default_rng(0)
        out_np = utils.apply_dynamic_masking_batch(
            ids, lengths, P, MASK_ID, SPECIALS, VOCAB, rng,
            selection_rate=0.3, mask_token_rate=0.8, random_token_rate=0.1)
        out_nat = run_native(ids, lengths, seed=2)
        sel_np = np.zeros_like(ids, dtype=float)
        sel_nat = np.zeros_like(ids, dtype=float)
        for out, acc in [(out_np, sel_np), (out_nat, sel_nat)]:
            w = out["masked_lm_weights"].astype(bool)
            rows, slots = np.nonzero(w)
            acc[rows, out["masked_lm_positions"][rows, slots]] = 1.0
        # per-position selection frequency across the batch
        np.testing.assert_allclose(sel_np.mean(axis=0), sel_nat.mean(axis=0),
                                   atol=0.04)


class TestProcessedDatasetNative:

    def test_materialize_uses_native_and_stays_valid(self, monkeypatch):
        from bert4rec_tpu.dataloaders.processed_dataset import (
            MaskingConfig, ProcessedDataset,
        )
        rng = np.random.default_rng(0)
        seqs = [rng.integers(3, VOCAB, size=int(rng.integers(4, S)))
                .astype(np.int32) for _ in range(32)]
        cfg = MaskingConfig(max_seq_len=S, max_predictions_per_seq=P,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2,
                            masked_lm_rate=0.3)
        ds = ProcessedDataset(seqs, cfg, lambda: VOCAB)

        monkeypatch.setenv("BERT4REC_TPU_NATIVE", "1")
        f_native = ds.materialize(seed=3)
        monkeypatch.setenv("BERT4REC_TPU_NATIVE", "0")
        f_numpy = ds.materialize(seed=3)
        for f in (f_native, f_numpy):
            assert f["masked_lm_weights"].sum() > 0
            w = f["masked_lm_weights"].astype(bool)
            rows, slots = np.nonzero(w)
            pos = f["masked_lm_positions"][rows, slots]
            np.testing.assert_array_equal(
                f["labels"][rows, pos], f["masked_lm_ids"][rows, slots])
        # same seed, same engine -> reproducible
        monkeypatch.setenv("BERT4REC_TPU_NATIVE", "1")
        f2 = ds.materialize(seed=3)
        np.testing.assert_array_equal(f_native["input_word_ids"],
                                      f2["input_word_ids"])
