"""Model + MLM head + ranking tests (contract parity with reference
tests/models_tests/bert4rec_model_tests.py:42-139)."""

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel

VOCAB = 120
B, S, P = 4, 20, 6


def make_model(**kw):
    cfg = BERT4RecConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                         num_attention_heads=4, inner_dim=64,
                         max_sequence_length=S,
                         max_predictions_per_seq=P, **kw)
    return BERT4RecModel(config=cfg)


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, VOCAB, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    positions = np.sort(np.stack(
        [rng.choice(S, size=P, replace=False) for _ in range(B)]), axis=1)
    return {
        "labels": jnp.asarray(ids),
        "input_word_ids": jnp.asarray(ids),
        "input_mask": jnp.asarray(mask),
        "masked_lm_positions": jnp.asarray(positions.astype(np.int32)),
        "masked_lm_ids": jnp.asarray(
            np.take_along_axis(ids, positions, axis=1)),
        "masked_lm_weights": jnp.asarray(np.ones((B, P), np.int32)),
    }


class TestBERT4RecModel:

    def test_forward_output_contract(self):
        model = make_model()
        params = model.init(jax.random.key(0))
        out = model.apply(params, make_batch())
        assert out["sequence_output"].shape == (B, S, 32)
        assert out["pooled_output"].shape == (B, 32)
        assert out["mlm_logits"].shape == (B, P, VOCAB)
        assert out["mlm_logits"].dtype == jnp.float32

    def test_no_mlm_logits_without_positions(self):
        model = make_model()
        params = model.init(jax.random.key(0))
        batch = make_batch()
        del batch["masked_lm_positions"]
        out = model.apply(params, batch)
        assert "mlm_logits" not in out

    def test_mlm_logits_gather_positions(self):
        """Logits at position p must depend on sequence_output[p]."""
        model = make_model()
        params = model.init(jax.random.key(0))
        batch = make_batch()
        out = model.apply(params, batch)
        # recompute logits from a single position and compare
        single = dict(batch)
        single["masked_lm_positions"] = batch["masked_lm_positions"][:, :1]
        out1 = model.apply(params, single)
        np.testing.assert_allclose(np.asarray(out1["mlm_logits"][:, 0]),
                                   np.asarray(out["mlm_logits"][:, 0]),
                                   rtol=1e-5, atol=1e-5)

    def test_rank_with_candidates(self):
        model = make_model()
        params = model.init(jax.random.key(0))
        batch = make_batch()
        C = 11
        rng = np.random.default_rng(1)
        candidates = jnp.asarray(
            rng.integers(3, VOCAB, size=(B, P, C)).astype(np.int32))
        rankings, probs = model.rank_with_candidates(params, batch, candidates)
        assert rankings.shape == (B, P, C)
        assert probs.shape == (B, P, VOCAB)
        # rankings are a permutation of the candidates
        np.testing.assert_array_equal(
            np.sort(np.asarray(rankings), axis=-1),
            np.sort(np.asarray(candidates), axis=-1))
        # ordered by decreasing logit
        out = model.apply(params, batch)
        logits = np.asarray(out["mlm_logits"])
        got = np.take_along_axis(logits, np.asarray(rankings), axis=-1)
        assert (np.diff(got, axis=-1) <= 1e-6).all()

    def test_rank_full_vocab(self):
        model = make_model()
        params = model.init(jax.random.key(0))
        rankings, probs = model.rank_full_vocab(params, make_batch())
        assert rankings.shape == (B, P, VOCAB)
        first = np.asarray(rankings)[..., 0]
        argmax = np.asarray(probs).argmax(axis=-1)
        np.testing.assert_array_equal(first, argmax)

    def test_prediction_mask(self):
        model = make_model()
        params = model.init(jax.random.key(0))
        out = model.apply(params, make_batch(), apply_prediction_mask=True)
        special = np.asarray(out["mlm_logits"])[..., :3]
        assert (special < -1e8).all()

    def test_weight_tying(self):
        """MLM logits must move when the embedding table moves."""
        model = make_model()
        params = model.init(jax.random.key(0))
        batch = make_batch()
        out1 = model.apply(params, batch)
        params2 = jax.tree.map(lambda x: x, params)
        params2["encoder"]["item_embeddings"]["embedding"] = (
            params["encoder"]["item_embeddings"]["embedding"] * 2.0)
        out2 = model.apply(params2, batch)
        assert not np.allclose(np.asarray(out1["mlm_logits"]),
                               np.asarray(out2["mlm_logits"]))

    def test_vocab_padding_masked(self):
        """vocab_pad_to rounds the table up; padded ids never rank/score."""
        model = make_model(vocab_pad_to=64)
        assert model.config.padded_vocab_size == 128
        params = model.init(jax.random.key(0))
        assert params["encoder"]["item_embeddings"]["embedding"].shape[0] == 128
        assert params["mlm"]["output_bias"].shape == (128,)
        out = model.apply(params, make_batch())
        logits = np.asarray(out["mlm_logits"])
        assert logits.shape[-1] == 128
        assert (logits[..., VOCAB:] <= -1e8).all()
        rankings, _ = model.rank_full_vocab(params, make_batch())
        # the top (vocab) entries never include padding ids
        assert (np.asarray(rankings)[..., :VOCAB] < VOCAB).all()

    def test_jit_rank_items(self):
        model = make_model()
        params = model.init(jax.random.key(0))
        batch = make_batch()
        ranked = jax.jit(model.rank_full_vocab)(params, batch)[0]
        ranked_eager = model.rank_full_vocab(params, batch)[0]
        np.testing.assert_array_equal(np.asarray(ranked),
                                      np.asarray(ranked_eager))
