"""shard_map'd candidate scoring on a vocab-sharded table vs the dense op.

The eval hot path gathers ~101 candidate rows per masked position from the
tied table; with the table sharded P('model', None), GSPMD would all-gather
the full table per batch. ``score_candidates_sharded`` keeps the gather
shard-local and psums only the ``[B, P, C]`` partial logits — these tests
pin exact-math equality with the dense path on TP and DPxTP meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
from bert4rec_tpu.ops.candidate_scoring import (
    score_candidates,
    score_candidates_sharded,
)


def setup(b=4, p=5, c=11, v=512, w=32, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(b, p, w)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32))
    # candidates spanning every shard, incl. shard-boundary rows 0, v/2, v-1
    cand = rng.integers(0, v, size=(b, p, c)).astype(np.int32)
    cand[0, 0, :3] = [0, v // 2, v - 1]
    return hidden, table, bias, jnp.asarray(cand)


class TestShardedCandidateScoring:

    @pytest.mark.parametrize("mp", [2, 8])
    def test_matches_dense(self, mp):
        mesh = create_mesh(MeshConfig(model_parallelism=mp))
        hidden, table, bias, cand = setup()
        out = jax.jit(lambda h, t, b, c: score_candidates_sharded(
            h, t, b, c, mesh))(hidden, table, bias, cand)
        ref = score_candidates(hidden, table, bias, cand)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_dp_tp_mesh_with_placed_shardings(self):
        """DP(4) x TP(2) with the operands actually placed on the mesh the
        way the evaluator's jitted computation sees them."""
        mesh = create_mesh(MeshConfig(model_parallelism=2))
        hidden, table, bias, cand = setup(b=8)
        hidden_s = jax.device_put(
            hidden, NamedSharding(mesh, P("data", None, None)))
        table_s = jax.device_put(table, NamedSharding(mesh, P("model", None)))
        bias_s = jax.device_put(bias, NamedSharding(mesh, P("model")))
        cand_s = jax.device_put(
            cand, NamedSharding(mesh, P("data", None, None)))
        out = jax.jit(lambda h, t, b, c: score_candidates_sharded(
            h, t, b, c, mesh))(hidden_s, table_s, bias_s, cand_s)
        ref = score_candidates(hidden, table, bias, cand)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_indivisible_vocab_falls_back(self):
        mesh = create_mesh(MeshConfig(model_parallelism=8))
        hidden, table, bias, cand = setup(v=510)  # 510 % 8 != 0
        out = score_candidates_sharded(hidden, table, bias, cand, mesh)
        ref = score_candidates(hidden, table, bias, cand)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestModelShardedScoring:

    def test_model_score_candidates_with_mesh(self):
        """model.score_candidates(mesh=...) on vocab-sharded params equals
        the meshless path on host params (padded-vocab config)."""
        from bert4rec_tpu.core import partitioning
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel

        mesh = create_mesh(MeshConfig(model_parallelism=8))
        cfg = BERT4RecConfig(vocab_size=301, hidden_size=32, num_layers=2,
                             num_attention_heads=4, inner_dim=64,
                             max_sequence_length=12,
                             max_predictions_per_seq=3, vocab_pad_to=8)
        model = BERT4RecModel(config=cfg)
        params = model.init(jax.random.key(0))
        sharded = jax.device_put(
            params, partitioning.param_shardings(mesh, params))

        rng = np.random.default_rng(0)
        batch = {
            "input_word_ids": jnp.asarray(
                rng.integers(3, 301, size=(2, 12)).astype(np.int32)),
            "input_mask": jnp.ones((2, 12), jnp.int32),
            "masked_lm_positions": jnp.asarray(
                [[1, 4, 7], [0, 3, 9]], dtype=jnp.int32),
        }
        cand = jnp.asarray(rng.integers(3, 301, size=(2, 3, 7))
                           .astype(np.int32))
        out = jax.jit(lambda pr, b, c: model.score_candidates(
            pr, b, c, mesh=mesh))(sharded, batch, cand)
        ref = model.score_candidates(params, batch, cand)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
