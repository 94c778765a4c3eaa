"""Temporal markov-oracle laws (evaluation/temporal_oracle.py): the
generator's exact time-ROUTED conditionals, the sparse scorer vs a dense
brute-force oracle, regime decoding from timestamps, and the ceiling
ordering (temporal Bayes > time-blind Bayes > popularity floor) under
the real sampled-negative protocol."""

import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.dataloaders.processed_dataset import (
    MaskingConfig, ProcessedDataset,
)
from bert4rec_tpu.evaluation import PopularityScorer
from bert4rec_tpu.evaluation.markov_oracle import evaluate_scorer
from bert4rec_tpu.evaluation.temporal_oracle import (
    TemporalMarkovCatalog, TemporalOracleScorer,
)

CAT = TemporalMarkovCatalog(n_items=64, branching=4, alpha=0.7,
                            zipf_s=1.05, seed=3)


def test_law_is_a_distribution():
    law = CAT.cond_prob()
    np.testing.assert_allclose(law.sum(1), 1.0, rtol=1e-9)
    # transition component is genuinely informative vs popularity
    assert np.abs(law - CAT.pop[None, :]).max() > 0.05


def test_sampled_sequences_follow_the_routed_law():
    seqs, tss = CAT.sample_sequences(400, 60, 64, seed=9)
    counts = np.zeros((CAT.n_items, CAT.n_items))
    for toks, ts in zip(seqs, tss):
        items = toks.astype(np.int64) - CAT.n_specials
        gap = np.diff(ts)
        regime = (gap > CAT.regime_threshold_s).astype(int)
        for t in range(2, len(items)):
            ctx = items[t - 1] if regime[t - 1] == 0 else items[t - 2]
            counts[ctx, items[t]] += 1
    rows = np.where(counts.sum(1) >= 200)[0]
    assert len(rows) >= 3
    emp = counts[rows] / counts[rows].sum(1, keepdims=True)
    exact = CAT.cond_prob()[rows]
    assert np.abs(emp - exact).max() < 0.12
    # gaps are regime-deterministic and the first step is forced fast
    all_gaps = np.concatenate([np.diff(ts) for ts in tss])
    assert set(np.unique(all_gaps)) == set(CAT.gaps)
    assert all(ts[1] - ts[0] == CAT.gaps[0] for ts in tss)


def _batch(seed=0, b=6, s=24, p=5):
    """A synthetic eval batch with timestamps whose gaps decode to
    regimes, plus random candidates (some hitting both contexts'
    successor sets)."""
    rng = np.random.default_rng(seed)
    seqs, tss = CAT.sample_sequences(b, s, s, seed=seed)
    ids = np.stack([q[:s] for q in seqs])
    ts = np.stack([q[:s] for q in tss])
    pos = np.sort(rng.choice(np.arange(2, s), size=p, replace=False))
    pos = np.tile(pos, (b, 1))
    cand = rng.integers(0, CAT.vocab_size + 2, size=(b, p, 31))
    prev1 = np.take_along_axis(ids, pos - 1, axis=1) - CAT.n_specials
    prev2 = np.take_along_axis(ids, pos - 2, axis=1) - CAT.n_specials
    cand[..., :4] = CAT.succ[prev1] + CAT.n_specials
    cand[..., 4:8] = CAT.succ[prev2] + CAT.n_specials
    return {
        "input_word_ids": jnp.asarray(ids.astype(np.int32)),
        "input_mask": jnp.ones((b, s), jnp.int32),
        "input_timestamps": jnp.asarray(ts),
        "masked_lm_positions": jnp.asarray(pos.astype(np.int32)),
    }, jnp.asarray(cand.astype(np.int32))


@pytest.mark.parametrize("blind", [False, True])
def test_scorer_matches_dense_bruteforce(blind):
    batch, cand = _batch()
    scorer = TemporalOracleScorer(CAT, time_blind=blind)
    got = np.asarray(scorer.score_candidates(None, batch, cand))

    s = CAT.n_specials
    ids = np.asarray(batch["input_word_ids"])
    ts = np.asarray(batch["input_timestamps"])
    pos = np.asarray(batch["masked_lm_positions"])
    law = CAT.cond_prob()
    b, p, c = got.shape
    for i in range(b):
        for j in range(p):
            pp = pos[i, j]
            a, z = ids[i, pp - 1] - s, ids[i, pp - 2] - s
            if blind:
                row = 0.5 * (law[a] + law[z])
            else:
                regime = int(ts[i, pp] - ts[i, pp - 1]
                             > CAT.regime_threshold_s)
                row = law[z] if regime else law[a]
            for k in range(c):
                ck = int(cand[i, j, k])
                if not (s <= ck < CAT.vocab_size):
                    assert got[i, j, k] < -1e30
                    continue
                want = np.log(max(row[ck - s], 1e-30))
                assert got[i, j, k] == pytest.approx(want, rel=1e-4), \
                    (i, j, k, blind)


def test_no_second_back_context_is_structurally_fast():
    """At masked position 1 both scorers condition on the single
    previous token (generation forces the first step fast)."""
    batch, cand = _batch(seed=2)
    pos = np.asarray(batch["masked_lm_positions"]).copy()
    pos[:, 0] = 1
    batch["masked_lm_positions"] = jnp.asarray(pos)
    law = CAT.cond_prob()
    ids = np.asarray(batch["input_word_ids"])
    s = CAT.n_specials
    for blind in (False, True):
        got = np.asarray(TemporalOracleScorer(CAT, time_blind=blind)
                         .score_candidates(None, batch, cand))
        i = 3
        ck = int(np.asarray(cand)[i, 0, 0])
        want = np.log(max(law[ids[i, 0] - s, ck - s], 1e-30))
        assert got[i, 0, 0] == pytest.approx(want, rel=1e-4), blind


def test_offset_shifts_context_and_regime_consistently():
    batch, cand = _batch(seed=4)
    # keep positions >= 3 so the shifted two-back index stays in range
    pos = np.asarray(batch["masked_lm_positions"])
    assert (pos >= 2).all()
    batch["masked_lm_positions"] = jnp.asarray(np.maximum(pos, 3))
    broken = TemporalOracleScorer(CAT, context_offset=-1)
    got = np.asarray(broken.score_candidates(None, batch, cand))
    s = CAT.n_specials
    ids = np.asarray(batch["input_word_ids"])
    ts = np.asarray(batch["input_timestamps"])
    pos = np.asarray(batch["masked_lm_positions"])
    law = CAT.cond_prob()
    i, j = 2, 3
    pp = pos[i, j]
    regime = int(ts[i, pp - 1] - ts[i, pp - 2] > CAT.regime_threshold_s)
    ctx = ids[i, pp - 2] - s if regime == 0 else ids[i, pp - 3] - s
    ck = int(cand[i, j, 0])
    want = np.log(max(law[ctx, ck - s], 1e-30))
    assert got[i, j, 0] == pytest.approx(want, rel=1e-4)


def test_ceiling_ordering_under_the_real_protocol():
    """temporal Bayes > time-blind Bayes > popularity floor, all through
    the actual evaluator + sampled-negative protocol.

    The discriminating metrics are HR@1 and NDCG@10: the blind marginal
    spreads mass over BOTH contexts' successor supports, so the ground
    truth still sits top-10 against popularity negatives while the time
    signal decides the top-rank ordering."""
    cat = TemporalMarkovCatalog(n_items=256, branching=4, alpha=0.7,
                                zipf_s=1.05, seed=3)
    seqs, tss = cat.sample_sequences(256, 24, 32, seed=11)
    cfg = MaskingConfig(max_seq_len=32, max_predictions_per_seq=8,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.3)
    test = ProcessedDataset(seqs, cfg, lambda: cat.vocab_size,
                            finetuning=np.ones(len(seqs), bool),
                            timestamps=tss)
    source = [int(t) for q in seqs for t in q]
    kw = dict(source=source, sample_size=100, seed=0, batch_size=128)
    oracle = evaluate_scorer(TemporalOracleScorer(cat), None, test, **kw)
    blind = evaluate_scorer(TemporalOracleScorer(cat, time_blind=True),
                            None, test, **kw)
    floor = evaluate_scorer(
        PopularityScorer.from_source(source, cat.vocab_size), None, test,
        **kw)
    assert float(oracle["HR@1"]) > float(blind["HR@1"]) + 0.04
    assert float(oracle["NDCG@10"]) > float(blind["NDCG@10"]) + 0.03
    assert float(blind["NDCG@10"]) > float(floor["NDCG@10"]) + 0.05
    assert float(oracle["HR@10"]) < 0.98  # non-saturating


@pytest.mark.parametrize("blind", [False, True])
def test_host_full_ranking_matches_scorer_bruteforce(blind):
    """host_full_ranking_temporal_oracle (numpy dense law) must agree
    rank-for-rank with brute force through the device scorer's sparse
    score_candidates over the ENTIRE catalog, under the evaluator's
    exclusion law — the paired-ceiling property the temporal
    full-ranking gate rests on."""
    from bert4rec_tpu.evaluation.temporal_oracle import (
        host_full_ranking_temporal_oracle,
    )
    cat = CAT
    v = cat.vocab_size
    seqs, tss = cat.sample_sequences(48, 16, 24, seed=5)
    cfg = MaskingConfig(max_seq_len=24, max_predictions_per_seq=6,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.3)
    ds = ProcessedDataset(seqs, cfg, lambda: v,
                          finetuning=np.ones(len(seqs), bool),
                          timestamps=tss)
    _, host_ranks = host_full_ranking_temporal_oracle(
        cat, ds, time_blind=blind, batch_size=16)

    scorer = TemporalOracleScorer(cat, time_blind=blind)
    got = []
    for batch in ds.batches(16, shuffle=False, seed=0):
        feats = {k: np.asarray(x) for k, x in batch.items()
                 if k not in ("labels", "example_weights")}
        labels = np.asarray(batch["labels"])
        gt = np.asarray(batch["masked_lm_ids"]).astype(np.int64)
        valid = np.asarray(batch["masked_lm_weights"]) > 0
        b, p = gt.shape
        cand = np.broadcast_to(np.arange(v, dtype=np.int32),
                               (b, p, v)).copy()
        scores = np.asarray(scorer.score_candidates(None, feats, cand))
        g = np.take_along_axis(scores, gt[..., None], axis=-1)
        excl = np.zeros((b, v), bool)
        np.put_along_axis(excl, np.where(labels > 0, labels, 0),
                          labels > 0, axis=1)
        np.put_along_axis(excl, np.where(valid, gt, 0), valid, axis=1)
        scores = np.where(excl[:, None, :], -np.inf, scores)
        np.put_along_axis(scores, gt[..., None], -np.inf, axis=-1)
        got.append(((scores >= g).sum(axis=-1) + 1)[valid])
    np.testing.assert_array_equal(np.concatenate(got), host_ranks)
