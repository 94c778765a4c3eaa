"""Fused tied-softmax loss kernel parity (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.ops.fused_mlm_loss import fused_mlm_loss, mlm_loss_and_metrics
from bert4rec_tpu.trainers import trainer_utils

V, W = 100, 32


def reference(hidden, table, bias, labels, vocab_size):
    logits = hidden @ table.T + bias
    col = jnp.arange(table.shape[0])
    logits = jnp.where(col >= vocab_size, -1e9, logits)
    loss = trainer_utils.masked_sparse_categorical_crossentropy(
        labels[None], logits[None])
    macc = trainer_utils.masked_accuracy(labels[None], logits[None])
    acc = trainer_utils.sparse_categorical_accuracy(labels[None],
                                                    logits[None])
    return loss, macc, acc


def make(rows=512, vocab_padding=0, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(rows, W)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(V + vocab_padding, W)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(V + vocab_padding,))
                       .astype(np.float32))
    labels = rng.integers(0, V, size=rows).astype(np.int32)
    labels[rng.random(rows) < 0.3] = 0  # padding rows
    return hidden, table, bias, jnp.asarray(labels)


class TestFusedMLMLoss:

    @pytest.mark.parametrize("rows", [512, 300])  # aligned + padded tiles
    def test_forward_matches_reference(self, rows):
        hidden, table, bias, labels = make(rows)
        loss, cv, ca, nv = fused_mlm_loss(hidden, table, bias, labels, V,
                                          True)
        ref_loss, ref_macc, ref_acc = reference(hidden, table, bias, labels,
                                                V)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        n_valid = int((np.asarray(labels) != 0).sum())
        assert int(nv) == n_valid
        np.testing.assert_allclose(float(cv) / max(n_valid, 1),
                                   float(ref_macc), rtol=1e-6)
        np.testing.assert_allclose(float(ca) / rows, float(ref_acc),
                                   rtol=1e-6)

    def test_vocab_padding_never_predicted(self):
        hidden, table, bias, labels = make(512, vocab_padding=28)
        loss, cv, ca, nv = fused_mlm_loss(hidden, table, bias, labels, V,
                                          True)
        ref_loss, _, _ = reference(hidden, table, bias, labels, V)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    def test_grads_match_reference(self):
        hidden, table, bias, labels = make(512)

        def loss_fused(h, t, b):
            return fused_mlm_loss(h, t, b, labels, V, True)[0]

        def loss_ref(h, t, b):
            return reference(h, t, b, labels, V)[0]

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(hidden, table, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(hidden, table, bias)
        for name, a, b in zip(["dhidden", "dtable", "dbias"], gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6, err_msg=name)

    def test_wrapper_metrics(self):
        hidden, table, bias, labels = make(512)
        loss, logs = mlm_loss_and_metrics(
            hidden.reshape(4, 128, W), table, bias,
            labels.reshape(4, 128), V, interpret=True)
        _, ref_macc, ref_acc = reference(hidden, table, bias, labels, V)
        np.testing.assert_allclose(float(logs["masked_accuracy"]),
                                   float(ref_macc), rtol=1e-6)
        np.testing.assert_allclose(float(logs["accuracy"]), float(ref_acc),
                                   rtol=1e-6)


class TestFusedLossTraining:

    def test_model_trains_with_fused_loss(self):
        from bert4rec_tpu.dataloaders.processed_dataset import (
            MaskingConfig, ProcessedDataset,
        )
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        from bert4rec_tpu.trainers import BERT4RecTrainer, optimizers

        rng = np.random.default_rng(0)
        seqs = [((np.arange(int(rng.integers(8, 17)))
                  + int(rng.integers(0, 40))) % 40 + 3).astype(np.int32)
                for _ in range(128)]
        cfg = MaskingConfig(max_seq_len=16, max_predictions_per_seq=4,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2,
                            masked_lm_rate=0.3)
        ds = ProcessedDataset(seqs, cfg, lambda: 43)
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=43, hidden_size=32, num_layers=2,
            num_attention_heads=4, inner_dim=64, max_sequence_length=16,
            max_predictions_per_seq=4, use_fused_loss=True))
        trainer = BERT4RecTrainer(model)
        trainer.initialize_model(
            optimizer=optimizers.create_adam_w_optimizer(
                init_lr=1e-2, num_train_steps=2000, num_warmup_steps=10),
            rng=jax.random.key(0))
        h = trainer.train(ds, epochs=8, batch_size=32, verbose=False)
        assert h.history["loss"][-1] < h.history["loss"][0]
        assert "masked_accuracy" in h.history
        assert h.history["masked_accuracy"][-1] > \
            h.history["masked_accuracy"][0]

    def test_fused_and_unfused_loss_paths_agree(self):
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        kw = dict(vocab_size=60, hidden_size=32, num_layers=2,
                  num_attention_heads=4, inner_dim=64,
                  max_sequence_length=12, max_predictions_per_seq=3)
        m_fused = BERT4RecModel(config=BERT4RecConfig(use_fused_loss=True,
                                                      **kw))
        m_plain = BERT4RecModel(config=BERT4RecConfig(**kw))
        params = m_plain.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        ids = rng.integers(3, 60, size=(4, 12)).astype(np.int32)
        positions = np.stack([np.sort(rng.choice(12, size=3, replace=False))
                              for _ in range(4)]).astype(np.int32)
        batch = {
            "input_word_ids": jnp.asarray(ids),
            "input_mask": jnp.ones((4, 12), jnp.int32),
            "masked_lm_positions": jnp.asarray(positions),
            "masked_lm_ids": jnp.asarray(
                np.take_along_axis(ids, positions, axis=1)),
            "masked_lm_weights": jnp.ones((4, 3), jnp.int32),
        }
        lf, logs_f = m_fused.loss_and_metrics(params, batch)
        lp, logs_p = m_plain.loss_and_metrics(params, batch)
        np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
        for k in logs_p:
            np.testing.assert_allclose(float(logs_f[k]), float(logs_p[k]),
                                       rtol=1e-5, err_msg=k)


class TestFusedLossGuards:
    """Applicability routing: small vocabs -> whole-table kernel; larger ->
    vocab-tiled flash-softmax kernels; only absurd tables -> XLA path."""

    def test_single_tile_bounds(self):
        from bert4rec_tpu.ops.fused_mlm_loss import fused_loss_supported
        assert fused_loss_supported(3712, 128)          # ML-1M
        assert not fused_loss_supported(26732, 128)     # ML-20M
        assert not fused_loss_supported(335424, 128)    # Reddit

    def test_tiled_availability(self):
        from bert4rec_tpu.ops.fused_mlm_loss import fused_loss_available
        assert fused_loss_available(26732, 128)         # ML-20M -> tiled
        assert fused_loss_available(335424, 128)        # Reddit -> tiled
        assert not fused_loss_available(3_000_000, 128)  # table > 1 GB

    def test_unavailable_model_falls_back(self, monkeypatch):
        import jax
        import numpy as np
        import bert4rec_tpu.ops.fused_mlm_loss as fml
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel

        def boom(*a, **k):
            raise AssertionError("fused loss called despite failing guard")

        monkeypatch.setattr(fml, "mlm_loss_and_metrics", boom)
        monkeypatch.setattr(fml, "fused_loss_available",
                            lambda *a: False)
        cfg = BERT4RecConfig(vocab_size=500, hidden_size=32, num_layers=1,
                             num_attention_heads=2, inner_dim=64,
                             max_sequence_length=8,
                             max_predictions_per_seq=2, use_fused_loss=True)
        model = BERT4RecModel(config=cfg)
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        batch = {
            "input_word_ids": rng.integers(3, 500, size=(2, 8))
            .astype(np.int32),
            "input_mask": np.ones((2, 8), np.int32),
            "masked_lm_positions": np.array([[0, 1], [2, 3]], np.int32),
            "masked_lm_ids": rng.integers(3, 500, size=(2, 2))
            .astype(np.int32),
            "masked_lm_weights": np.ones((2, 2), np.int32),
        }
        loss, logs = model.loss_and_metrics(params, batch)
        assert abs(float(loss) - np.log(500)) < 1.0


class TestTiledFusedLoss:
    """The vocab-tiled flash-softmax kernels must match the single-tile
    kernel and XLA autodiff exactly (interpret mode)."""

    @staticmethod
    def _setup(rows=70, w=32, v=5000, vocab_size=4990, seed=0):
        import jax
        import jax.numpy as jnp
        import numpy as np
        rng = np.random.default_rng(seed)
        hidden = jnp.asarray(rng.normal(size=(rows, w)).astype(np.float32))
        table = jnp.asarray(
            rng.normal(size=(v, w)).astype(np.float32) * 0.05)
        bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32) * 0.1)
        labels = rng.integers(0, vocab_size, size=rows).astype(np.int32)
        labels[::7] = 0  # some pad rows
        return hidden, table, bias, jnp.asarray(labels), vocab_size

    def test_forward_matches_xla(self):
        import jax.numpy as jnp
        import numpy as np
        from bert4rec_tpu.ops.fused_mlm_loss import fused_mlm_loss_tiled
        from bert4rec_tpu.trainers import trainer_utils
        hidden, table, bias, labels, vs = self._setup()
        loss, cv, ca, nv = fused_mlm_loss_tiled(hidden, table, bias,
                                                labels, vs, True)
        logits = (hidden @ table.T + bias)[None]
        col = np.arange(table.shape[0])
        logits = jnp.where(col[None, None, :] >= vs, -1e9, logits)
        want = trainer_utils.masked_sparse_categorical_crossentropy(
            labels[None], logits)
        np.testing.assert_allclose(float(loss), float(want), rtol=2e-5)
        want_acc = trainer_utils.masked_accuracy(labels[None], logits)
        np.testing.assert_allclose(float(cv) / float(nv), float(want_acc),
                                   rtol=1e-6)
        assert int(nv) == int((np.asarray(labels) != 0).sum())

    def test_matches_single_tile_kernel(self):
        import numpy as np
        from bert4rec_tpu.ops.fused_mlm_loss import (
            fused_mlm_loss, fused_mlm_loss_tiled,
        )
        hidden, table, bias, labels, vs = self._setup(v=3000,
                                                      vocab_size=3000)
        a = fused_mlm_loss(hidden, table, bias, labels, vs, True)
        b = fused_mlm_loss_tiled(hidden, table, bias, labels, vs, True)
        for x, y in zip(a, b):
            np.testing.assert_allclose(float(x), float(y), rtol=2e-5)

    def test_gradients_match_xla(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from bert4rec_tpu.ops.fused_mlm_loss import fused_mlm_loss_tiled
        from bert4rec_tpu.trainers import trainer_utils
        hidden, table, bias, labels, vs = self._setup(rows=40, v=4100,
                                                      vocab_size=4096)

        def loss_tiled(h, t, b):
            return fused_mlm_loss_tiled(h, t, b, labels, vs, True)[0]

        def loss_xla(h, t, b):
            logits = (h @ t.T + b)[None]
            col = jnp.arange(t.shape[0])[None, None, :]
            logits = jnp.where(col >= vs, -1e9, logits)
            return trainer_utils.masked_sparse_categorical_crossentropy(
                labels[None], logits)

        g_t = jax.grad(loss_tiled, argnums=(0, 1, 2))(hidden, table, bias)
        g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(hidden, table, bias)
        for name, a, b in zip("htb", g_t, g_x):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(b).max() + 1e-9
            assert np.abs(a - b).max() / denom < 2e-4, name

    def test_randomized_boundary_sweep(self):
        """Random shapes across every tile-boundary regime (rows below /
        at / off the row tile, vocab off the VTILE grid, all-pad rows,
        label-0 rows, merged vs two-sweep backward) vs the XLA oracle —
        the regression net for kernel tiling changes."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from bert4rec_tpu.ops import fused_mlm_loss as fml
        from bert4rec_tpu.trainers import trainer_utils

        rng = np.random.default_rng(42)
        for case in range(6):
            rows = int(rng.integers(1, 130))
            w = int(rng.choice([8, 16, 32]))
            vs = int(rng.integers(50, 3000))
            v = vs + int(rng.integers(0, 40))
            hidden = jnp.asarray(
                rng.normal(size=(rows, w)).astype(np.float32))
            table = jnp.asarray(
                rng.normal(size=(v, w)).astype(np.float32) * 0.1)
            bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32))
            labels_np = rng.integers(0, vs, size=rows).astype(np.int32)
            if case == 3:
                labels_np[:] = 0  # every row padding: loss 0, nv 0
            elif case == 4:
                labels_np[::2] = 0
            labels = jnp.asarray(labels_np)
            # exercise BOTH backward forms across cases
            two_sweep = case % 2 == 1
            old = fml._MERGED_DH_BYTES
            fml._MERGED_DH_BYTES = 0 if two_sweep else old
            try:
                def loss_tiled(h, t, b, labels=labels, vs=vs):
                    return fml.fused_mlm_loss_tiled(h, t, b, labels, vs,
                                                    True)[0]

                def loss_xla(h, t, b, labels=labels, vs=vs):
                    logits = (h @ t.T + b)[None]
                    col = jnp.arange(t.shape[0])[None, None, :]
                    logits = jnp.where(col >= vs, -1e9, logits)
                    return trainer_utils \
                        .masked_sparse_categorical_crossentropy(
                            labels[None], logits)

                lt = float(loss_tiled(hidden, table, bias))
                lx = float(loss_xla(hidden, table, bias))
                assert abs(lt - lx) <= 2e-5 * max(1.0, abs(lx)), \
                    (case, rows, w, vs, v)
                g_t = jax.grad(loss_tiled, argnums=(0, 1, 2))(
                    hidden, table, bias)
                g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(
                    hidden, table, bias)
                for name, a, b in zip("htb", g_t, g_x):
                    a, b = np.asarray(a), np.asarray(b)
                    denom = np.abs(b).max() + 1e-9
                    assert np.abs(a - b).max() / denom < 3e-4, \
                        (case, name, rows, w, vs, v)
            finally:
                fml._MERGED_DH_BYTES = old
