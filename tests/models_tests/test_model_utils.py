"""model_utils tests (reference tests/models_tests/model_utils_tests.py:
path modes + standalone rank_items math)."""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.models import model_utils
from bert4rec_tpu.utils import utils


class TestDetermineModelPath:

    def test_absolute_passthrough(self, tmp_path):
        p = tmp_path / "m"
        assert model_utils.determine_model_path(p, mode=0) == p
        assert model_utils.determine_model_path(p, mode=2) == p

    def test_mode_0_project_root(self):
        out = model_utils.determine_model_path("my_model", mode=0)
        assert out == utils.get_default_model_save_path() / "my_model"

    def test_mode_1_env_base(self):
        out = model_utils.determine_model_path("my_model", mode=1)
        assert out == utils.get_virtual_env_path() / "my_model"

    def test_mode_2_as_given(self):
        assert model_utils.determine_model_path("rel/path", mode=2) == \
            pathlib.Path("rel/path")

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError):
            model_utils.determine_model_path("x", mode=9)


class TestPopularityBiasInit:

    def _model(self, vocab=50):
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        import jax
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=vocab, max_sequence_length=16,
            max_predictions_per_seq=4, hidden_size=16, num_layers=1,
            num_attention_heads=2, inner_dim=32))
        return model, model.init(jax.random.key(0))

    def test_bias_is_log_prior(self):
        model, params = self._model()
        counts = np.zeros(50)
        counts[3] = 90
        counts[4] = 10
        new = model_utils.init_output_bias_from_popularity(
            params, counts, smoothing=1.0)
        bias = np.asarray(new["mlm"]["output_bias"])
        total = 100 + 50
        np.testing.assert_allclose(bias[3], np.log(91 / total), rtol=1e-6)
        np.testing.assert_allclose(bias[0], np.log(1 / total), rtol=1e-6)
        np.testing.assert_allclose(np.exp(bias).sum(), 1.0, rtol=1e-5)
        # input untouched
        assert float(np.asarray(params["mlm"]["output_bias"])[3]) == 0.0

    def test_initial_loss_drops_to_popularity_entropy(self):
        # with a skewed prior, the initial masked loss should start near
        # the prior's cross-entropy on those labels, well under ln(V)
        import jax
        model, params = self._model()
        counts = np.zeros(50)
        counts[5] = 1000  # nearly all mass on item 5
        new = model_utils.init_output_bias_from_popularity(params, counts)
        inputs = {
            "input_word_ids": jnp.full((2, 16), 5, jnp.int32),
            "input_mask": jnp.ones((2, 16), jnp.int32),
            "masked_lm_positions": jnp.zeros((2, 4), jnp.int32),
            "masked_lm_ids": jnp.full((2, 4), 5, jnp.int32),
            "masked_lm_weights": jnp.ones((2, 4), jnp.float32),
        }
        loss_zero, _ = model.loss_and_metrics(params, inputs)
        loss_prior, _ = model.loss_and_metrics(new, inputs)
        assert float(loss_prior) < float(loss_zero) / 4
        assert abs(float(loss_zero) - np.log(50)) < 0.5

    def test_short_counts_padded_and_validation(self):
        model, params = self._model()
        new = model_utils.init_output_bias_from_popularity(
            params, np.ones(10))
        assert new["mlm"]["output_bias"].shape == \
            params["mlm"]["output_bias"].shape
        with pytest.raises(ValueError):
            model_utils.init_output_bias_from_popularity(
                params, np.ones(10_000))
        with pytest.raises(ValueError):
            model_utils.init_output_bias_from_popularity(
                params, np.ones(10), smoothing=0.0)


class TestStandaloneRankItems:

    def test_rank_logits_full(self):
        logits = jnp.asarray([[0.1, 3.0, -1.0, 2.0]])
        rankings, probs = model_utils.rank_items(logits)
        np.testing.assert_array_equal(np.asarray(rankings)[0], [1, 3, 0, 2])
        np.testing.assert_allclose(np.asarray(probs).sum(), 1.0, rtol=1e-6)

    def test_rank_with_embeddings(self):
        rng = np.random.default_rng(0)
        hidden = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
        table = jnp.asarray(rng.normal(size=(10, 8)).astype(np.float32))
        rankings, probs = model_utils.rank_items(hidden, embeddings=table)
        assert rankings.shape == (2, 10)
        manual = np.asarray(hidden) @ np.asarray(table).T
        np.testing.assert_array_equal(np.asarray(rankings),
                                      np.argsort(-manual, axis=-1))

    def test_rank_with_candidate_subset(self):
        logits = jnp.asarray([[0.0, 5.0, 1.0, 3.0, 2.0]])
        items = jnp.asarray([[4, 1, 3]])
        rankings, _ = model_utils.rank_items(logits, items=items)
        np.testing.assert_array_equal(np.asarray(rankings)[0], [1, 3, 4])
