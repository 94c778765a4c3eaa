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
    """VMEM applicability guard: big-vocab configs must route to the XLA
    path instead of attempting to hold the whole table in VMEM."""

    def test_ml1m_scale_supported(self):
        from bert4rec_tpu.ops.fused_mlm_loss import fused_loss_supported
        assert fused_loss_supported(3712, 128)

    def test_ml20m_and_reddit_scale_rejected(self):
        from bert4rec_tpu.ops.fused_mlm_loss import fused_loss_supported
        assert not fused_loss_supported(26732, 128)
        assert not fused_loss_supported(335424, 128)

    def test_big_vocab_model_falls_back(self, monkeypatch):
        """use_fused_loss=True on an over-budget vocab must run the XLA
        logits path, never the kernel."""
        import jax
        import numpy as np
        import bert4rec_tpu.ops.fused_mlm_loss as fml
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel

        def boom(*a, **k):
            raise AssertionError("fused loss called despite failing guard")

        monkeypatch.setattr(fml, "mlm_loss_and_metrics", boom)
        cfg = BERT4RecConfig(vocab_size=30000, hidden_size=32, num_layers=1,
                             num_attention_heads=2, inner_dim=64,
                             max_sequence_length=8,
                             max_predictions_per_seq=2, use_fused_loss=True,
                             embedding_width=128)
        model = BERT4RecModel(config=cfg)
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        batch = {
            "input_word_ids": rng.integers(3, 30000, size=(2, 8))
            .astype(np.int32),
            "input_mask": np.ones((2, 8), np.int32),
            "masked_lm_positions": np.array([[0, 1], [2, 3]], np.int32),
            "masked_lm_ids": rng.integers(3, 30000, size=(2, 2))
            .astype(np.int32),
            "masked_lm_weights": np.ones((2, 2), np.int32),
        }
        loss, logs = model.loss_and_metrics(params, batch)
        assert np.isfinite(float(loss))
        assert abs(float(loss) - np.log(30000)) < 1.0
