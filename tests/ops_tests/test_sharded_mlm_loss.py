"""Vocab-sharded fused loss (shard_map + cross-shard online softmax) vs the
global XLA reference, on the 8-virtual-device mesh (interpret kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
from bert4rec_tpu.ops.sharded_mlm_loss import (
    sharded_fused_mlm_loss,
    sharded_mlm_loss_and_metrics,
)
from bert4rec_tpu.trainers import trainer_utils


def setup(rows=64, w=32, v=4096, vocab_size=4090, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(rows, w)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32) * 0.1)
    labels = rng.integers(0, vocab_size, size=rows).astype(np.int32)
    labels[::7] = 0                      # pad rows
    labels[3] = v // 2                   # exactly on a shard boundary
    labels[5] = v // 4
    return hidden, table, bias, jnp.asarray(labels), vocab_size


def xla_reference(hidden, table, bias, labels, vocab_size):
    logits = (hidden @ table.T + bias)[None]
    col = jnp.arange(table.shape[0])[None, None, :]
    logits = jnp.where(col >= vocab_size, -1e9, logits)
    loss = trainer_utils.masked_sparse_categorical_crossentropy(
        labels[None], logits)
    macc = trainer_utils.masked_accuracy(labels[None], logits)
    acc = trainer_utils.sparse_categorical_accuracy(labels[None], logits)
    return loss, macc, acc


class TestShardedFusedLoss:

    @pytest.mark.parametrize("mp", [2, 8])
    def test_forward_matches_xla(self, mp):
        mesh = create_mesh(MeshConfig(model_parallelism=mp))
        hidden, table, bias, labels, vs = setup()
        loss, cv, ca, nv = jax.jit(
            lambda h, t, b: sharded_fused_mlm_loss(
                h, t, b, labels, vs, mesh, True))(hidden, table, bias)
        want_loss, want_macc, want_acc = xla_reference(
            hidden, table, bias, labels, vs)
        np.testing.assert_allclose(float(loss), float(want_loss), rtol=2e-5)
        np.testing.assert_allclose(float(cv) / float(nv), float(want_macc),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(ca) / hidden.shape[0],
                                   float(want_acc), rtol=1e-6)
        assert int(nv) == int((np.asarray(labels) != 0).sum())

    @pytest.mark.parametrize("mp", [8, 2])
    def test_gradients_match_xla(self, mp):
        # mp=2 puts data=4 in the mesh: the DP x TP topology where the
        # table/bias grads MUST psum over 'data' (each replica sees only
        # its batch slice) — regression test for the missing reduction
        mesh = create_mesh(MeshConfig(model_parallelism=mp))
        hidden, table, bias, labels, vs = setup(rows=32, v=2048,
                                                vocab_size=2048)

        def loss_sharded(h, t, b):
            return sharded_fused_mlm_loss(h, t, b, labels, vs, mesh,
                                          True)[0]

        def loss_xla(h, t, b):
            return xla_reference(h, t, b, labels, vs)[0]

        g_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(
            hidden, table, bias)
        g_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(
            hidden, table, bias)
        for name, a, b in zip("htb", g_s, g_x):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            assert rel < 2e-4, (name, rel)

    def test_sharded_inputs_stay_sharded(self):
        """With the table actually placed P('model', None), the jitted loss
        runs without gathering it (smoke: executes + correct value)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = create_mesh(MeshConfig(model_parallelism=8))
        hidden, table, bias, labels, vs = setup()
        table = jax.device_put(table, NamedSharding(mesh, P("model", None)))
        bias = jax.device_put(bias, NamedSharding(mesh, P("model")))
        loss, *_ = jax.jit(
            lambda h, t, b: sharded_fused_mlm_loss(
                h, t, b, labels, vs, mesh, True))(hidden, table, bias)
        want = xla_reference(np.asarray(hidden), np.asarray(table),
                             np.asarray(bias), labels, vs)[0]
        np.testing.assert_allclose(float(loss), float(want), rtol=2e-5)

    def test_loss_and_metrics_wrapper(self):
        mesh = create_mesh(MeshConfig(model_parallelism=2))
        hidden, table, bias, labels, vs = setup(rows=32)
        loss, logs = sharded_mlm_loss_and_metrics(
            hidden, table, bias, labels, vs, mesh, True)
        assert set(logs) == {"masked_accuracy", "accuracy"}
        assert np.isfinite(float(loss))
