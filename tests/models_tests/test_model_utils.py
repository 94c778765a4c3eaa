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
