"""PopularityScorer baseline: protocol compatibility + ranking law."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.dataloaders import samplers
from bert4rec_tpu.dataloaders.processed_dataset import (
    MaskingConfig, ProcessedDataset,
)
from bert4rec_tpu.evaluation import BERT4RecEvaluator, PopularityScorer

VOCAB = 23


def make_test_ds(n=32, seq=10, seed=1):
    rng = np.random.default_rng(seed)
    rows = [((np.arange(int(rng.integers(5, seq + 1)))
              + int(rng.integers(0, VOCAB - 3))) % (VOCAB - 3) + 3)
            .astype(np.int32) for _ in range(n)]
    cfg = MaskingConfig(max_seq_len=seq, max_predictions_per_seq=2,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2)
    return rows, ProcessedDataset(rows, cfg, lambda: VOCAB,
                                  finetuning=np.ones(n, bool))


class TestPopularityScorer:

    def test_score_candidates_is_count_order(self):
        counts = np.zeros(VOCAB)
        counts[[3, 4, 5]] = [7, 100, 1]
        scorer = PopularityScorer(counts)
        cand = jnp.asarray([[[3, 4, 5]]])
        scores = np.asarray(scorer.score_candidates(None, {}, cand))[0, 0]
        assert scores[1] > scores[0] > scores[2]

    def test_specials_never_outrank(self):
        counts = np.full(VOCAB, 5.0)
        counts[[0, 1, 2]] = 1e9
        scorer = PopularityScorer(counts)
        cand = jnp.asarray([[[0, 1, 2, 3]]])
        scores = np.asarray(scorer.score_candidates(None, {}, cand))[0, 0]
        assert np.argmax(scores) == 3

    def test_full_vocab_rank_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        counts = rng.integers(0, 50, size=VOCAB).astype(np.float64)
        scorer = PopularityScorer(counts)
        gt = np.asarray([[5, 9]], dtype=np.int32)
        inputs = {"masked_lm_ids": jnp.asarray(gt)}
        ranks = np.asarray(scorer.gt_ranks_full_vocab(None, inputs))

        scores = counts.copy()
        scores[[0, 1, 2]] = -1e9
        for j, g in enumerate(gt[0]):
            others = np.delete(np.arange(VOCAB), g)
            expect = 1 + int(np.sum(scores[others] >= scores[g]))
            assert ranks[0, j] == expect

    def test_through_evaluator_both_protocols(self):
        rows, test_ds = make_test_ds()
        source = [int(t) for r in rows for t in r]
        scorer = PopularityScorer.from_source(source, VOCAB)

        sampled = BERT4RecEvaluator(
            sampler=samplers.get("pop_random", source=source,
                                 vocab=list(dict.fromkeys(source)),
                                 sample_size=10, seed=0),
            sample_size=10).evaluate(scorer, None, test_ds,
                                     batch_size=16, progress_bar=False)
        assert sampled["Valid Ranks"] == 32
        assert 0.0 <= sampled["HR@10"] <= 1.0

        full = BERT4RecEvaluator(full_ranking=True).evaluate(
            scorer, None, test_ds, batch_size=16, progress_bar=False)
        assert full["Valid Ranks"] == 32
        # sampled rank <= full rank per position => sampled metrics >= full
        assert sampled["HR@10"] >= full["HR@10"] - 1e-9

    def test_trained_model_beats_floor(self):
        """The end-to-end point of the baseline: a model that learned the
        deterministic next-in-cycle structure must beat popularity."""
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        from bert4rec_tpu.trainers import BERT4RecTrainer, optimizers

        rows, test_ds = make_test_ds()
        train_rows = [((np.arange(8) + i) % (VOCAB - 3) + 3)
                      .astype(np.int32) for i in range(128)]
        cfg = MaskingConfig(max_seq_len=10, max_predictions_per_seq=2,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2,
                            masked_lm_rate=0.3)
        train_ds = ProcessedDataset(train_rows, cfg, lambda: VOCAB)
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=VOCAB, hidden_size=32, num_layers=1,
            num_attention_heads=2, inner_dim=64, max_sequence_length=10,
            max_predictions_per_seq=2))
        trainer = BERT4RecTrainer(model)
        trainer.initialize_model(
            optimizer=optimizers.create_adam_w_optimizer(
                init_lr=1e-2, num_train_steps=5000, num_warmup_steps=20),
            rng=jax.random.key(0))
        trainer.train(train_ds, epochs=30, batch_size=32, verbose=False)

        source = [int(t) for r in rows for t in r]

        def ev():
            return BERT4RecEvaluator(
                sampler=samplers.get("pop_random", source=source,
                                     vocab=list(dict.fromkeys(source)),
                                     sample_size=10, seed=0),
                sample_size=10)

        model_m = ev().evaluate(model, trainer.params, test_ds,
                                batch_size=16, progress_bar=False)
        floor_m = ev().evaluate(PopularityScorer.from_source(source, VOCAB),
                                None, test_ds, batch_size=16,
                                progress_bar=False)
        assert model_m["NDCG@10"] > floor_m["NDCG@10"]
