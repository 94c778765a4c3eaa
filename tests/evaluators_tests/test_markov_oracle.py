"""The non-saturating quality benchmark (VERDICT r2 next #1).

Earlier synthetic quality artifacts saturated at HR@10 0.98-1.0 — unable
to detect a subtle protocol/masking bug. Here the planted structure is
stochastic (Markov mixture, ``markov_oracle.MarkovCatalog``) with a
computable Bayes-optimal scorer, so quality parity becomes a QUANTITATIVE
gate: the oracle's metrics are a ceiling strictly inside (0, 1), a
correctly-trained model must close most of the oracle-floor gap, and
deliberately broken variants (off-by-one context, shuffled negatives,
wrong eval masking) must measurably fail.

All numbers in these tests are deterministic: catalog/train/test/eval
seeds are pinned and the evaluator draws seeded negatives.
"""

import jax
import numpy as np
import pytest

from bert4rec_tpu.dataloaders.processed_dataset import (
    MaskingConfig, ProcessedDataset,
)
from bert4rec_tpu.evaluation import PopularityScorer
from bert4rec_tpu.evaluation.markov_oracle import (
    MarkovCatalog, MarkovOracleScorer, evaluate_scorer,
)

N_ITEMS = 512
SEQ = 32
SAMPLE = 100


@pytest.fixture(scope="module")
def bench():
    """Catalog + datasets + the reference points every test shares."""
    cat = MarkovCatalog(n_items=N_ITEMS, branching=8, alpha=0.6,
                        zipf_s=1.1, seed=0)
    train_seqs = cat.sample_sequences(3000, 16, SEQ, seed=1)
    test_seqs = cat.sample_sequences(512, 16, SEQ, seed=2)
    cfg = MaskingConfig(max_seq_len=SEQ, max_predictions_per_seq=8,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.3)
    train = ProcessedDataset(train_seqs, cfg, lambda: cat.vocab_size)
    test = ProcessedDataset(test_seqs, cfg, lambda: cat.vocab_size,
                            finetuning=np.ones(len(test_seqs), bool))
    source = [int(t) for s in train_seqs for t in s]
    oracle = evaluate_scorer(MarkovOracleScorer(cat), None, test,
                             source=source, sample_size=SAMPLE, seed=0)
    return dict(cat=cat, train=train, test=test, source=source,
                train_seqs=train_seqs, oracle=oracle)


class TestCatalogLaw:

    def test_conditional_rows_are_distributions(self):
        cat = MarkovCatalog(n_items=64, branching=4, alpha=0.7, seed=3)
        m = cat.next_prob()
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-9)
        assert (m > 0).all()  # popularity tail gives every pair mass

    def test_log_matrix_token_space(self):
        cat = MarkovCatalog(n_items=16, branching=4, seed=3)
        lm = cat.log_next_prob_matrix()
        assert lm.shape == (19, 19)
        # special columns never score
        assert (lm[:, :3] < -1e30).all()
        # special rows = popularity fallback over items
        np.testing.assert_allclose(lm[0, 3:], np.log(cat.pop), rtol=1e-5)
        # item rows match the law
        np.testing.assert_allclose(
            np.exp(lm[3:, 3:].astype(np.float64)), cat.next_prob(),
            rtol=1e-4)

    def test_dense_rank_path_refuses_catalog_scale(self):
        """gt_ranks_full_vocab must refuse to pin a multi-GB dense [V, V]
        matrix on device (ADVICE r4): above DENSE_VOCAB_LIMIT the sparse
        score_candidates path is the only supported scorer."""
        cat = MarkovCatalog(n_items=16, branching=4, seed=3)
        scorer = MarkovOracleScorer(cat)
        scorer._vocab = MarkovOracleScorer.DENSE_VOCAB_LIMIT + 1
        with pytest.raises(ValueError, match="dense"):
            scorer.gt_ranks_full_vocab(None, {
                "masked_lm_ids": np.zeros((1, 1), np.int32),
                "masked_lm_positions": np.zeros((1, 1), np.int32),
                "input_word_ids": np.zeros((1, 4), np.int32)})

    def test_vectorized_supports_at_catalog_width(self):
        """Above FAST_SUPPORT_THRESHOLD the catalog uses the vectorized
        popularity-weighted support sampler (the per-row choice loop is
        O(V^2) — hours at the Reddit catalog's 335k items). Rows must be
        distinct, in range, and strongly popularity-weighted."""
        from bert4rec_tpu.evaluation.markov_oracle import (
            FAST_SUPPORT_THRESHOLD, sample_popularity_supports,
        )
        n = FAST_SUPPORT_THRESHOLD + 1
        cat = MarkovCatalog(n_items=n, branching=8, seed=7)
        assert cat.succ.shape == (n, 8)
        assert cat.succ.min() >= 0 and cat.succ.max() < n
        srt = np.sort(cat.succ, axis=1)
        assert not (srt[:, 1:] == srt[:, :-1]).any()
        # popularity-weighted: successors' mean popularity far above the
        # uniform 1/n (zipf head items dominate the draws)
        assert cat.pop[cat.succ].mean() > 50.0 / n
        # the standalone sampler is deterministic given the rng state
        rng = np.random.default_rng(3)
        a = sample_popularity_supports(np.random.default_rng(3), cat.pop,
                                       100, 8)
        b = sample_popularity_supports(rng, cat.pop, 100, 8)
        np.testing.assert_array_equal(a, b)

    def test_sample_sequences_reproducible_and_follow_law(self):
        cat = MarkovCatalog(n_items=64, branching=4, alpha=0.9,
                            dirichlet=0.3, seed=3)
        a = cat.sample_sequences(100, 8, 16, seed=7)
        b = cat.sample_sequences(100, 8, 16, seed=7)
        assert all((x == y).all() for x, y in zip(a, b))
        assert all(8 <= len(s) <= 16 for s in a)
        assert all(s.min() >= 3 and s.max() < cat.vocab_size for s in a)
        # with alpha=0.9 the planted transitions dominate: the empirical
        # P(next in successors(prev)) must be near alpha (vs ~B/n by chance)
        seqs = cat.sample_sequences(500, 16, 16, seed=8)
        hits = total = 0
        for s in seqs:
            items = s - 3
            for t in range(1, len(items)):
                hits += items[t] in cat.succ[items[t - 1]]
                total += 1
        frac = hits / total
        assert 0.85 < frac < 0.97, frac


class TestHostFullRankingOracle:

    def test_matches_device_dense_scorer_through_evaluator(self, bench):
        """host_full_ranking_oracle (numpy, dense law) must produce the
        SAME metrics as the device dense scorer driven through
        BERT4RecEvaluator(full_ranking=True) — the paired-ceiling
        property the full-ranking oracle gate rests on."""
        from bert4rec_tpu.evaluation import BERT4RecEvaluator
        from bert4rec_tpu.evaluation.markov_oracle import (
            fits_host_dense, host_full_ranking_oracle,
        )
        cat, test = bench["cat"], bench["test"]
        assert fits_host_dense(cat)
        host, ranks = host_full_ranking_oracle(cat, test, batch_size=128)
        scorer = MarkovOracleScorer(cat)
        ev = BERT4RecEvaluator(full_ranking=True)
        device = ev.evaluate(scorer, None, test, batch_size=128,
                             progress_bar=False)
        assert host["Valid Ranks"] == device["Valid Ranks"] == len(ranks)
        for k in device:
            np.testing.assert_allclose(host[k], device[k], rtol=1e-9,
                                       err_msg=k)


class TestProtocolSensitivity:
    """The benchmark must NOT saturate and MUST detect protocol bugs."""

    def test_oracle_is_non_saturated_ceiling(self, bench):
        o = bench["oracle"]
        assert 0.70 <= o["HR@10"] <= 0.92, o["HR@10"]
        assert 0.45 <= o["NDCG@10"] <= 0.78, o["NDCG@10"]
        assert o["Valid Ranks"] == len(bench["test"])

    def test_oracle_clears_popularity_floor(self, bench):
        floor = evaluate_scorer(
            PopularityScorer.from_source(bench["source"],
                                         bench["cat"].vocab_size),
            None, bench["test"], source=bench["source"],
            sample_size=SAMPLE, seed=0)
        assert bench["oracle"]["HR@10"] >= floor["HR@10"] + 0.15
        assert bench["oracle"]["NDCG@10"] >= floor["NDCG@10"] + 0.12

    def test_off_by_one_context_collapses(self, bench):
        """An LOO/position-misalignment bug (scoring from the token two
        back) must be clearly visible."""
        broken = evaluate_scorer(
            MarkovOracleScorer(bench["cat"], context_offset=-1), None,
            bench["test"], source=bench["source"], sample_size=SAMPLE,
            seed=0)
        assert broken["HR@10"] <= 0.75 * bench["oracle"]["HR@10"]
        assert broken["NDCG@10"] <= 0.70 * bench["oracle"]["NDCG@10"]

    def test_shuffled_negatives_measurably_inflate(self, bench):
        """Swapping the popularity-weighted sampler for uniform draws is
        a protocol bug that INFLATES sampled metrics — the benchmark must
        see it (Krichene & Rendle bias made visible)."""
        uniform = evaluate_scorer(
            MarkovOracleScorer(bench["cat"]), None, bench["test"],
            source=bench["source"], sample_size=SAMPLE, seed=0,
            sampler="random")
        assert uniform["HR@10"] >= bench["oracle"]["HR@10"] + 0.02
        assert uniform["NDCG@10"] >= bench["oracle"]["NDCG@10"] + 0.08

    def test_wrong_eval_masking_degrades(self, bench):
        """Evaluating on random mid-sequence masks instead of the LOO
        last-position protocol shifts the numbers measurably (contexts
        with masked neighbors lose their conditioning signal)."""
        cfg = MaskingConfig(max_seq_len=SEQ, max_predictions_per_seq=8,
                            mask_token_id=1, pad_token_id=0,
                            unk_token_id=2, masked_lm_rate=0.3)
        wrong = ProcessedDataset(
            bench["cat"].sample_sequences(512, 16, SEQ, seed=2), cfg,
            lambda: bench["cat"].vocab_size)  # finetuning=False: MLM masks
        res = evaluate_scorer(MarkovOracleScorer(bench["cat"]), None,
                              wrong, source=bench["source"],
                              sample_size=SAMPLE, seed=0)
        assert abs(res["HR@10"] - bench["oracle"]["HR@10"]) >= 0.02


class TestSASRecFamilyGate:
    """The same non-saturating benchmark gates the CAUSAL next-item
    family (tools/quality_run.py --oracle --oracle-family sasrec).

    Under the next-item protocol the predicted position holds its own
    context item (the label is the FOLLOWING item —
    dataloader_utils.next_item_features), so the Bayes oracle conditions
    one step later: ``context_offset=1``; ``context_offset=0`` is the
    off-by-one bug under this protocol.
    """

    @pytest.fixture(scope="class")
    def next_item_test(self, bench):
        cfg = MaskingConfig(max_seq_len=SEQ, max_predictions_per_seq=8,
                            mask_token_id=1, pad_token_id=0,
                            unk_token_id=2, masked_lm_rate=0.3)
        seqs = bench["cat"].sample_sequences(512, 16, SEQ, seed=2)
        return ProcessedDataset(seqs, cfg, lambda: bench["cat"].vocab_size,
                                finetuning=np.ones(len(seqs), bool),
                                task="next_item")

    def test_next_item_oracle_offset_and_ceiling(self, bench,
                                                 next_item_test):
        """offset=1 is the Bayes predictor for next-item batches — same
        non-saturated ceiling as the MLM protocol on the same law — and
        offset=0 (conditioning one step early) collapses."""
        o = evaluate_scorer(
            MarkovOracleScorer(bench["cat"], context_offset=1), None,
            next_item_test, source=bench["source"], sample_size=SAMPLE,
            seed=0)
        assert 0.70 <= o["HR@10"] <= 0.92, o["HR@10"]
        assert abs(o["HR@10"] - bench["oracle"]["HR@10"]) <= 0.06
        broken = evaluate_scorer(
            MarkovOracleScorer(bench["cat"], context_offset=0), None,
            next_item_test, source=bench["source"], sample_size=SAMPLE,
            seed=0)
        assert broken["HR@10"] <= 0.75 * o["HR@10"]

    def test_sasrec_closes_gap_and_noncausal_leak_collapses(
            self, bench, next_item_test):
        """A trained SASRec must reach >=80% of the causal Bayes ceiling;
        the SAME training run with bidirectional attention (the
        missing-causal-mask bug: each label is visible at position p+1 of
        its own input) must collapse at eval, where the target is dropped
        from the input."""
        from bert4rec_tpu.models import (
            BERT4RecConfig, BERT4RecModel, SASRecModel, model_utils,
        )
        from bert4rec_tpu.trainers import BERT4RecTrainer, optimizers

        cat = bench["cat"]
        cfg = MaskingConfig(max_seq_len=SEQ, max_predictions_per_seq=8,
                            mask_token_id=1, pad_token_id=0,
                            unk_token_id=2, masked_lm_rate=0.3)
        train = ProcessedDataset(bench["train_seqs"], cfg,
                                 lambda: cat.vocab_size, task="next_item")

        def fit(model_cls, epochs):
            model = model_cls(config=BERT4RecConfig(
                vocab_size=cat.vocab_size, hidden_size=64, num_layers=2,
                num_attention_heads=4, inner_dim=128,
                max_sequence_length=SEQ, max_predictions_per_seq=8))
            params = model_utils.init_output_bias_from_popularity(
                model.init(jax.random.key(0)),
                np.bincount(bench["source"], minlength=cat.vocab_size))
            trainer = BERT4RecTrainer(model)
            trainer.initialize_model(
                optimizer=optimizers.create_adam_w_optimizer(
                    init_lr=1e-3, num_train_steps=20_000,
                    num_warmup_steps=50),
                params=params)
            trainer.train(train, epochs=epochs, batch_size=128,
                          verbose=False, seed=42)
            return evaluate_scorer(model, trainer.params, next_item_test,
                                   source=bench["source"],
                                   sample_size=SAMPLE, seed=0)

        o = evaluate_scorer(
            MarkovOracleScorer(cat, context_offset=1), None,
            next_item_test, source=bench["source"], sample_size=SAMPLE,
            seed=0)
        res = fit(SASRecModel, epochs=40)
        assert res["HR@10"] / o["HR@10"] >= 0.80, (res["HR@10"], o["HR@10"])
        assert res["HR@10"] <= o["HR@10"] + 0.05
        # the bidirectional model converges to copying in a few epochs —
        # and that copy signal is exactly what eval takes away
        leaked = fit(BERT4RecModel, epochs=15)
        assert leaked["HR@10"] <= res["HR@10"] - 0.10, \
            (leaked["HR@10"], res["HR@10"])


class TestModelClosesOracleGap:
    """The quantitative quality gate: a correctly-trained BERT4Rec must
    reach >=80% of the Bayes ceiling on HR@10 (and not materially beat
    it), on a benchmark that cannot saturate."""

    def test_trained_model_vs_oracle(self, bench):
        from bert4rec_tpu.models import (
            BERT4RecConfig, BERT4RecModel, model_utils,
        )
        from bert4rec_tpu.trainers import BERT4RecTrainer, optimizers

        cat = bench["cat"]
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=cat.vocab_size, hidden_size=64, num_layers=2,
            num_attention_heads=4, inner_dim=128,
            max_sequence_length=SEQ, max_predictions_per_seq=8))
        params = model.init(jax.random.key(0))
        # skip the unigram saddle so the training budget goes into the
        # sequence structure (model_utils.init_output_bias_from_popularity)
        params = model_utils.init_output_bias_from_popularity(
            params, np.bincount(bench["source"],
                                minlength=cat.vocab_size))
        trainer = BERT4RecTrainer(model)
        trainer.initialize_model(
            optimizer=optimizers.create_adam_w_optimizer(
                init_lr=1e-3, num_train_steps=20_000,
                num_warmup_steps=50),
            params=params)
        trainer.train(bench["train"], epochs=40, batch_size=128,
                      verbose=False, seed=42)

        res = evaluate_scorer(model, trainer.params, bench["test"],
                              source=bench["source"], sample_size=SAMPLE,
                              seed=0)
        o = bench["oracle"]
        ratio_hr = res["HR@10"] / o["HR@10"]
        ratio_ndcg = res["NDCG@10"] / o["NDCG@10"]
        # measured at these exact seeds: HR 0.729/0.838 = 0.87,
        # NDCG 0.520/0.618 = 0.84 — gates leave drift headroom while
        # still catching a 5-10% protocol/masking regression
        assert ratio_hr >= 0.80, (res["HR@10"], o["HR@10"])
        assert ratio_ndcg >= 0.75, (res["NDCG@10"], o["NDCG@10"])
        # nobody beats Bayes (sanity that the oracle IS the ceiling)
        assert res["HR@10"] <= o["HR@10"] + 0.05
