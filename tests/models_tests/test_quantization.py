"""int8 weights-only quantization (models/quantization.py): the math laws
(per-row scales commute with the tied matmul), the fast paths vs the
dequantized-dense oracle, and the quantized export artifact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.models import (
    BERT4RecConfig,
    BERT4RecModel,
    export,
    quantization,
)
from bert4rec_tpu.models.components import layers as L

VOCAB = 90
S, P = 12, 3


@pytest.fixture(scope="module")
def model_and_params():
    cfg = BERT4RecConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                         num_attention_heads=4, inner_dim=64,
                         max_sequence_length=S, max_predictions_per_seq=P)
    model = BERT4RecModel(config=cfg)
    params = model.init(jax.random.key(0))
    return model, params


def make_inputs(b=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_word_ids": rng.integers(3, VOCAB, size=(b, S)).astype(np.int32),
        "input_mask": np.ones((b, S), np.int32),
        "masked_lm_positions": np.tile(np.arange(P, dtype=np.int32), (b, 1)),
    }


class TestQuantizationLaws:

    def test_rounding_error_bounded_by_half_scale(self, model_and_params):
        _, params = model_and_params
        table = np.asarray(
            params["encoder"]["item_embeddings"]["embedding"], np.float32)
        q = L.quantize_embedding(params["encoder"]["item_embeddings"])
        deq = np.asarray(L.dequantize_embedding(q))
        scale = np.asarray(q["embedding_scale"])
        assert np.all(np.abs(deq - table) <= scale[:, None] * 0.5 + 1e-7)
        assert np.asarray(q["embedding_q"]).dtype == np.int8

    def test_lookup_equals_dequantized_gather(self, model_and_params):
        _, params = model_and_params
        emb = params["encoder"]["item_embeddings"]
        q = L.quantize_embedding(emb)
        ids = jnp.asarray([[3, 7, 42], [0, 89, 1]], jnp.int32)
        got = L.embedding_lookup(q, ids)
        want = jnp.take(L.dequantize_embedding(q), ids, axis=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)

    def test_quantize_params_structure(self, model_and_params):
        _, params = model_and_params
        qp = quantization.quantize_params(params)
        assert quantization.is_quantized(qp)
        assert not quantization.is_quantized(params)
        # idempotent; non-table leaves shared, not copied
        assert quantization.quantize_params(qp) is qp
        assert qp["mlm"] is params["mlm"]
        assert quantization.table_bytes(qp) < \
            quantization.table_bytes(params) / 2


class TestQuantizedFastPaths:
    """Every quantized fast path must equal the same model run on the
    dequantized dense table (the rounding error lives in the table, not in
    the path)."""

    def test_apply_logits_match_dequantized_oracle(self, model_and_params):
        model, params = model_and_params
        qp = quantization.quantize_params(params)
        oracle_params = quantization.dequantize_params(qp)
        inputs = make_inputs()
        got = np.asarray(model.apply(qp, inputs)["mlm_logits"])
        want = np.asarray(model.apply(oracle_params, inputs)["mlm_logits"])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_score_candidates_match_dequantized_oracle(self,
                                                       model_and_params):
        model, params = model_and_params
        qp = quantization.quantize_params(params)
        oracle_params = quantization.dequantize_params(qp)
        inputs = make_inputs(seed=3)
        cands = np.random.default_rng(5).integers(
            3, VOCAB, size=(4, P, 7)).astype(np.int32)
        got = np.asarray(model.score_candidates(qp, inputs, cands))
        want = np.asarray(model.score_candidates(oracle_params, inputs,
                                                 cands))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_rank_top_k_runs_quantized(self, model_and_params):
        model, params = model_and_params
        qp = quantization.quantize_params(params)
        ids, scores = jax.jit(
            lambda p, i: model.rank_top_k(p, i, 10))(qp, make_inputs())
        assert ids.shape == (4, P, 10)
        assert np.all(np.asarray(ids) < VOCAB)
        s = np.asarray(scores)
        assert np.all(s[..., :-1] >= s[..., 1:])  # sorted best-first

    def test_full_ranking_eval_accepts_quantized_params(self,
                                                        model_and_params):
        from bert4rec_tpu.evaluation import BERT4RecEvaluator
        model, params = model_and_params
        qp = quantization.quantize_params(params)
        inputs = make_inputs()
        batch = {**inputs,
                 "labels": inputs["input_word_ids"],
                 "masked_lm_ids": np.full((4, P), 5, np.int32),
                 "masked_lm_weights": np.ones((4, P), np.int32)}
        ranks = BERT4RecEvaluator(full_ranking=True).evaluate_batch(
            model, qp, batch)
        assert ranks.shape == (4 * P,)
        assert ranks.min() >= 1

    def test_tiled_rank_path_matches_dense_on_quantized_params(
            self, model_and_params):
        """At Reddit width the tiled rank path is the ONLY one that can
        run, and quantized serving params must route through it with the
        identical rank law (the tiled branch reads the dequantized
        table, exactly like the dense fallback)."""
        model, params = model_and_params
        qp = quantization.quantize_params(params)
        inputs = make_inputs()
        feats = {**inputs, "masked_lm_ids": np.full((4, P), 5, np.int32)}
        dense = np.asarray(model.gt_ranks_full_vocab(qp, feats))
        tiled = np.asarray(model.gt_ranks_full_vocab(qp, feats,
                                                     vocab_tile=16))
        np.testing.assert_array_equal(tiled, dense)


class TestQuantizedExport:

    def test_int8_artifact_smaller_and_correct(self, tmp_path):
        # catalog-scale vocab so the table dominates artifact overhead
        cfg = BERT4RecConfig(vocab_size=5000, hidden_size=32, num_layers=1,
                             num_attention_heads=4, inner_dim=64,
                             max_sequence_length=S,
                             max_predictions_per_seq=P)
        model = BERT4RecModel(config=cfg)
        params = model.init(jax.random.key(3))
        art_f32 = export.export_top_k(model, params, 10)
        art_q = export.export_top_k(model, params, 10, quantize="int8")
        p32, pq = tmp_path / "f32.jaxexport", tmp_path / "int8.jaxexport"
        export.save_artifact(art_f32, p32)
        export.save_artifact(art_q, pq)
        table = np.asarray(
            params["encoder"]["item_embeddings"]["embedding"])
        # the artifact must shed most of the table's fp32->int8 savings
        assert p32.stat().st_size - pq.stat().st_size > table.nbytes // 2

        inputs = make_inputs(seed=11)
        inputs["input_word_ids"] %= 5000
        got_ids, got_scores = export.load_artifact(pq).call(
            inputs["input_word_ids"], inputs["input_mask"],
            inputs["masked_lm_positions"])
        qp = quantization.quantize_params(params)
        want_ids, want_scores = model.rank_top_k(qp, inputs, 10)
        np.testing.assert_array_equal(np.asarray(got_ids),
                                      np.asarray(want_ids))
        np.testing.assert_allclose(np.asarray(got_scores),
                                   np.asarray(want_scores), rtol=1e-5)

    def test_unknown_mode_rejected(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="quantize"):
            export.export_top_k(model, params, 5, quantize="int4")
