"""Property/fuzz tests of the dynamic-masking law (SURVEY.md §7 hard part
2) across random configurations, for BOTH the numpy and native C++ engines:
whatever the rates/lengths/finetuning mix, every invariant of the reference
semantics must hold."""

import numpy as np
import pytest

from bert4rec_tpu.dataloaders import dataloader_utils as utils
from bert4rec_tpu.dataloaders import native

ENGINES = ["numpy"] + (["native"] if native.available() else [])


def run_masking(engine, input_ids, lengths, p, mask_id, specials, vocab,
                seed, rate, mask_rate, rand_rate, finetuning):
    if engine == "native":
        return native.apply_dynamic_masking_batch_native(
            input_ids, lengths, p, mask_id, specials, vocab, seed,
            selection_rate=rate, mask_token_rate=mask_rate,
            random_token_rate=rand_rate, finetuning=finetuning)
    return utils.apply_dynamic_masking_batch(
        input_ids, lengths, p, mask_id, specials, vocab,
        np.random.default_rng(seed), selection_rate=rate,
        mask_token_rate=mask_rate, random_token_rate=rand_rate,
        finetuning=finetuning)


@pytest.mark.parametrize("engine", ENGINES)
@pytest.mark.parametrize("trial", range(8))
def test_masking_invariants_hold_for_random_configs(engine, trial):
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(3, 24))
    s = int(rng.integers(5, 40))
    p = int(rng.integers(1, 12))
    vocab = int(rng.integers(10, 200))
    mask_id, pad_id, unk_id = 1, 0, 2
    specials = [unk_id, pad_id]
    rate = float(rng.uniform(0.05, 0.9))
    mask_rate = float(rng.uniform(0.3, 1.0))
    rand_rate = float(rng.uniform(0.0, 1.0 - mask_rate))
    finetuning = rng.random(n) < 0.4

    lengths = rng.integers(1, s + 1, size=n).astype(np.int32)
    input_ids = np.zeros((n, s), np.int32)
    for i in range(n):
        input_ids[i, :lengths[i]] = rng.integers(3, vocab,
                                                 size=lengths[i])

    out = run_masking(engine, input_ids, lengths, p, mask_id, specials,
                      vocab, int(rng.integers(2 ** 31)), rate, mask_rate,
                      rand_rate, finetuning)
    ids, pos, w = (out["masked_lm_ids"], out["masked_lm_positions"],
                   out["masked_lm_weights"])
    masked_input = out["input_word_ids"]

    assert ids.shape == pos.shape == w.shape == (n, p)
    for i in range(n):
        valid = w[i] > 0
        k = int(valid.sum())
        # valid slots are a prefix
        assert not valid[k:].any()
        if finetuning[i]:
            # finetuning: exactly the LAST token, always [MASK]
            assert k == 1
            assert pos[i, 0] == lengths[i] - 1
            assert masked_input[i, lengths[i] - 1] == mask_id
        else:
            want = min(p, max(1, int(lengths[i] * rate)))
            assert k == want, (lengths[i], rate, k, want)
            # ascending positions within the sequence
            assert (np.diff(pos[i, :k]) > 0).all() if k > 1 else True
        assert (pos[i, :k] < lengths[i]).all()
        # labels are the original tokens at those positions
        np.testing.assert_array_equal(ids[i, :k],
                                      input_ids[i, pos[i, :k]])
        # original tokens are never special (parity: specials unselectable)
        assert not np.isin(ids[i, :k], specials).any()
        # replacements: [MASK], a random non-special in-vocab token, or
        # the original kept
        repl = masked_input[i, pos[i, :k]]
        legal = ((repl == mask_id) | (repl == ids[i, :k])
                 | ((repl >= 0) & (repl < vocab)
                    & ~np.isin(repl, specials)))
        assert legal.all()
        if mask_rate == 1.0 and rand_rate == 0.0:
            assert (repl == mask_id).all()
        # untouched positions unchanged
        untouched = np.ones(s, bool)
        untouched[pos[i, :k]] = False
        np.testing.assert_array_equal(masked_input[i][untouched],
                                      input_ids[i][untouched])
        # padding slots are all zeros
        assert (ids[i, k:] == 0).all() and (pos[i, k:] == 0).all()


@pytest.mark.parametrize("engine", ENGINES)
def test_all_mask_rate_masks_every_selection(engine):
    rng = np.random.default_rng(0)
    n, s, p, vocab = 16, 20, 6, 50
    lengths = np.full(n, s, np.int32)
    input_ids = rng.integers(3, vocab, size=(n, s)).astype(np.int32)
    out = run_masking(engine, input_ids, lengths, p, 1, [2, 0], vocab, 7,
                      0.3, 1.0, 0.0, np.zeros(n, bool))
    for i in range(n):
        k = int((out["masked_lm_weights"][i] > 0).sum())
        sel = out["masked_lm_positions"][i, :k]
        assert (out["input_word_ids"][i, sel] == 1).all()
