"""Streaming input pipeline (VERDICT r1 weak #3/#4): chunked per-epoch
masking with bounded host memory, pure ``materialize``, and the threaded
host/device prefetcher."""

import numpy as np
import pytest

from bert4rec_tpu.dataloaders.processed_dataset import (
    MaskingConfig,
    ProcessedDataset,
)
from bert4rec_tpu.utils.prefetch import prefetch

VOCAB = 50
S = 8


def make_ds(n=100, seed=0, long_rows=False):
    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n):
        ln = int(rng.integers(S + 4, S + 20)) if long_rows \
            else int(rng.integers(3, S + 1))
        seqs.append(rng.integers(3, VOCAB, size=ln).astype(np.int32))
    cfg = MaskingConfig(max_seq_len=S, max_predictions_per_seq=2,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.3)
    return ProcessedDataset(seqs, cfg, lambda: VOCAB)


class TestPureMaterialize:

    def test_indices_call_is_pure(self):
        """materialize(indices=...) must not perturb later calls — the r1
        implementation refreshed over-long rows' crop windows in the shared
        cache as a side effect."""
        ds = make_ds(n=10, long_rows=True)
        before = ds.materialize(seed=0)
        ds.materialize(seed=123, indices=np.array([0, 3, 7]))
        ds.materialize(seed=99)
        after = ds.materialize(seed=0)
        for k in before:
            np.testing.assert_array_equal(before[k], after[k], err_msg=k)

    def test_long_row_crops_are_fresh_per_seed(self):
        ds = make_ds(n=20, long_rows=True)
        a = ds.materialize(seed=0)["labels"]
        b = ds.materialize(seed=1)["labels"]
        assert not np.array_equal(a, b)  # different crop windows

    def test_shared_cache_not_aliased(self):
        ds = make_ds(n=5, long_rows=True)
        feats = ds.materialize(seed=0)
        feats["labels"][:] = -1
        feats2 = ds.materialize(seed=0)
        assert not np.array_equal(feats2["labels"],
                                  np.full_like(feats2["labels"], -1))


class TestChunkedBatches:

    def test_epoch_covers_every_row_once(self):
        ds = make_ds(n=100)
        seen = []
        for batch in ds.batches(8, shuffle=True, seed=3, chunk_size=16):
            assert batch["labels"].shape[1] == S
            seen.append(batch["labels"])
        got = np.concatenate(seen)
        assert got.shape[0] == 100
        full = ds.materialize(seed=0)["labels"]  # crops: none (short rows)
        want = {tuple(r) for r in full}
        assert {tuple(r) for r in got} == want

    def test_chunked_equals_unchunked_row_set(self):
        ds = make_ds(n=64)
        chunked = np.concatenate([b["input_mask"] for b in ds.batches(
            8, shuffle=True, seed=1, chunk_size=16)])
        whole = np.concatenate([b["input_mask"] for b in ds.batches(
            8, shuffle=True, seed=1, chunk_size=10 ** 9)])
        assert sorted(map(tuple, chunked)) == sorted(map(tuple, whole))

    def test_drop_remainder_only_drops_epoch_tail(self):
        ds = make_ds(n=100)
        batches = list(ds.batches(8, shuffle=False, seed=0, chunk_size=16,
                                  drop_remainder=True))
        assert len(batches) == 12  # 96 rows; the final 4 dropped
        assert all(b["labels"].shape[0] == 8 for b in batches)

    def test_pad_final_batch(self):
        ds = make_ds(n=100)
        batches = list(ds.batches(8, shuffle=False, seed=0, chunk_size=16,
                                  pad_final_batch=True))
        assert len(batches) == 13
        assert all(b["labels"].shape[0] == 8 for b in batches)
        weights = batches[-1]["example_weights"]
        np.testing.assert_array_equal(weights,
                                      [1, 1, 1, 1, 0, 0, 0, 0])

    def test_deterministic_given_seed(self):
        ds = make_ds(n=40, long_rows=True)
        a = [b["input_word_ids"] for b in ds.batches(8, seed=5,
                                                     chunk_size=16)]
        b = [b["input_word_ids"] for b in ds.batches(8, seed=5,
                                                     chunk_size=16)]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestPrefetch:

    def test_order_preserved(self):
        assert list(prefetch(iter(range(50)), lambda x: x * 2)) == \
            [x * 2 for x in range(50)]

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("producer failed")

        it = prefetch(gen())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="producer failed"):
            list(it)

    def test_early_break_does_not_hang(self):
        produced = []

        def gen():
            for i in range(10 ** 6):
                produced.append(i)
                yield i

        for i in prefetch(gen(), depth=2):
            if i == 3:
                break
        assert len(produced) < 100  # producer stopped, not exhausted
