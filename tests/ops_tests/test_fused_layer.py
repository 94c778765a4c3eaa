"""Fused encoder-layer kernel parity vs the unfused transformer block
(interpret mode; dropout paths validated on hardware via
tools/verify_kernels_on_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.models.components import layers as L
from bert4rec_tpu.models.components.transformer import (
    init_transformer_block, transformer_block,
)
from bert4rec_tpu.ops.fused_encoder_layer import fused_encoder_layer

B, S, H, N, F = 3, 24, 32, 4, 64


def setup(seed=0):
    params = init_transformer_block(jax.random.key(seed), H, N, F, 0.02)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32) * 0.5)
    lengths = rng.integers(4, S + 1, size=B)
    mask = jnp.asarray((np.arange(S)[None, :] < lengths[:, None])
                       .astype(np.int32))
    return params, x, mask


def unfused(params, x, mask, dtype=jnp.float32, causal=False):
    # the kernel uses tanh-approximate gelu (no erf lowering in Mosaic);
    # compare against the same activation for tight tolerances
    attn_bias = L.self_attention_mask(mask)
    if causal:
        s = x.shape[1]
        idx = jnp.arange(s)
        attn_bias = attn_bias + jnp.where(
            idx[None, :] <= idx[:, None], 0.0, -1e9)[None, None]
    return transformer_block(
        params, x, attn_bias, num_heads=N,
        inner_activation=L.get_activation("gelu_approx"),
        output_dropout=0.0, attention_dropout=0.0,
        training=False, norm_first=False, compute_dtype=dtype)


class TestFusedLayerForward:

    def test_matches_unfused(self):
        params, x, mask = setup()
        ref = unfused(params, x, mask)
        out = fused_encoder_layer(params, x, mask, num_heads=N,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_bf16_matches_unfused(self):
        params, x, mask = setup()
        x16 = x.astype(jnp.bfloat16)
        ref = unfused(params, x16, mask, dtype=jnp.bfloat16)
        out = fused_encoder_layer(params, x16, mask, num_heads=N,
                                  interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32),
            np.asarray(ref, dtype=np.float32), rtol=8e-2, atol=8e-2)

    def test_causal_matches_unfused(self):
        params, x, mask = setup()
        ref = unfused(params, x, mask, causal=True)
        out = fused_encoder_layer(params, x, mask, num_heads=N,
                                  interpret=True, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        # triangle actually applied
        bidir = fused_encoder_layer(params, x, mask, num_heads=N,
                                    interpret=True)
        assert np.abs(np.asarray(out) - np.asarray(bidir)).max() > 1e-3

    def test_interpret_dropout_raises(self):
        params, x, mask = setup()
        with pytest.raises(ValueError):
            fused_encoder_layer(params, x, mask, num_heads=N,
                                attention_dropout=0.2, seed=1,
                                interpret=True)


class TestFusedLayerBackward:

    # NOTE: sum(y**2) of a layer-norm output is constant at init (g=1, b=0
    # make ||y||^2 == S*H per example), which zeroes every upstream
    # gradient — use a random projection loss so gradients are O(1).

    def test_input_grad_matches_unfused(self):
        params, x, mask = setup()
        proj = jnp.asarray(np.random.default_rng(7)
                           .normal(size=(B, S, H)).astype(np.float32))

        def loss_fused(x):
            return jnp.sum(fused_encoder_layer(
                params, x, mask, num_heads=N, interpret=True) * proj)

        def loss_ref(x):
            return jnp.sum(unfused(params, x, mask) * proj)

        g_fused = jax.grad(loss_fused)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-4)

    def test_causal_grads_match_unfused(self):
        params, x, mask = setup()
        proj = jnp.asarray(np.random.default_rng(7)
                           .normal(size=(B, S, H)).astype(np.float32))

        def loss_fused(x):
            return jnp.sum(fused_encoder_layer(
                params, x, mask, num_heads=N, interpret=True,
                causal=True) * proj)

        def loss_ref(x):
            return jnp.sum(unfused(params, x, mask, causal=True) * proj)

        g_fused = jax.grad(loss_fused)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-4)

    def test_weight_grads_match_unfused(self):
        params, x, mask = setup()
        proj = jnp.asarray(np.random.default_rng(7)
                           .normal(size=(B, S, H)).astype(np.float32))

        def loss_fused(params):
            return jnp.sum(fused_encoder_layer(
                params, x, mask, num_heads=N, interpret=True) * proj)

        def loss_ref(params):
            return jnp.sum(unfused(params, x, mask) * proj)

        g_fused = jax.grad(loss_fused)(params)
        g_ref = jax.grad(loss_ref)(params)
        flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
        flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
        for (path_f, leaf_f), (path_r, leaf_r) in zip(flat_f, flat_r):
            assert path_f == path_r
            scale = max(np.abs(np.asarray(leaf_r)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(leaf_f) / scale, np.asarray(leaf_r) / scale,
                rtol=5e-3, atol=5e-3,
                err_msg=str(path_f))


class TestFusedEncoderIntegration:

    def test_fused_encoder_matches_unfused(self):
        from bert4rec_tpu.models import BERT4RecConfig, Bert4RecEncoder
        kw = dict(vocab_size=60, hidden_size=32, num_layers=2,
                  num_attention_heads=4, inner_dim=64,
                  max_sequence_length=16)
        enc = Bert4RecEncoder(BERT4RecConfig(**kw))
        enc_fused = Bert4RecEncoder(
            BERT4RecConfig(use_fused_layer=True, **kw))
        params = enc.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, 60, size=(2, 16)).astype(np.int32))
        mask = jnp.asarray((np.arange(16)[None, :] < np.array([[16], [9]]))
                           .astype(np.int32))
        out = enc.apply(params, ids * mask, mask)
        out_fused = enc_fused.apply(params, ids * mask, mask)
        # fused path uses approximate gelu -> small systematic difference
        np.testing.assert_allclose(
            np.asarray(out_fused["sequence_output"]),
            np.asarray(out["sequence_output"]), rtol=2e-2, atol=5e-3)

    def test_fused_temporal_attention_matches_xla(self):
        """The temporal relative-time bias STREAMED into the fused kernel
        (rel_bias, with dScores streamed back out for the table grad)
        must match the XLA dense-bias path — forward and gradients
        including d(temporal_attention_bias)."""
        from bert4rec_tpu.models import BERT4RecConfig, Bert4RecEncoder
        kw = dict(vocab_size=60, hidden_size=32, num_layers=2,
                  num_attention_heads=4, inner_dim=64,
                  max_sequence_length=16, use_temporal_attention=True,
                  temporal_attention_buckets=16,
                  attention_dropout=0.0, output_dropout=0.0)
        enc = Bert4RecEncoder(BERT4RecConfig(**kw))
        enc_fused = Bert4RecEncoder(
            BERT4RecConfig(use_fused_layer=True, **kw))
        params = enc.init(jax.random.key(0))
        # non-trivial learned bias values (init may be zeros)
        params["temporal_attention_bias"]["embedding"] = jnp.asarray(
            np.random.default_rng(1).normal(size=(16, 4)).astype(np.float32))
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, 60, size=(2, 16)).astype(np.int32))
        mask = jnp.asarray((np.arange(16)[None, :] < np.array([[16], [9]]))
                           .astype(np.int32))
        base = np.int32(1_600_000_000)
        ts = jnp.asarray(base + np.cumsum(
            rng.integers(60, 100_000, size=(2, 16)), axis=1).astype(np.int32))

        def run(e, p):
            out = e.apply(p, ids * mask, mask, input_timestamps=ts)
            return out["sequence_output"]

        out_ref = run(enc, params)
        out_fused = run(enc_fused, params)
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_ref),
                                   rtol=2e-2, atol=5e-3)

        proj = jnp.asarray(rng.normal(size=out_ref.shape), jnp.float32)

        def loss(e):
            def f(p):
                return jnp.sum(run(e, p).astype(jnp.float32) * proj)
            return f

        g_ref = jax.grad(loss(enc))(params)
        g_fused = jax.grad(loss(enc_fused))(params)
        gt_r = np.asarray(g_ref["temporal_attention_bias"]["embedding"])
        gt_f = np.asarray(g_fused["temporal_attention_bias"]["embedding"])
        assert np.abs(gt_r).max() > 0, "test not exercising the bias"
        scale = np.abs(gt_r).max()
        np.testing.assert_allclose(gt_f / scale, gt_r / scale,
                                   rtol=5e-3, atol=5e-3)
        # the rest of the tree agrees too (gelu approximation tolerance)
        flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
        flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
        for (path_f, leaf_f), (path_r, leaf_r) in zip(flat_f, flat_r):
            assert path_f == path_r
            s = max(np.abs(np.asarray(leaf_r)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(leaf_f) / s, np.asarray(leaf_r) / s,
                rtol=2e-2, atol=2e-2, err_msg=str(path_f))

    def test_fused_temporal_causal_composition(self):
        """Temporal rel bias + causal triangle compose additively in the
        kernel; must match the XLA path that folds both into attn_bias."""
        from bert4rec_tpu.models import BERT4RecConfig, Bert4RecEncoder
        kw = dict(vocab_size=60, hidden_size=32, num_layers=1,
                  num_attention_heads=2, inner_dim=64,
                  max_sequence_length=12, use_temporal_attention=True,
                  temporal_attention_buckets=8, causal_attention=True,
                  attention_dropout=0.0, output_dropout=0.0)
        enc = Bert4RecEncoder(BERT4RecConfig(**kw))
        enc_fused = Bert4RecEncoder(
            BERT4RecConfig(use_fused_layer=True, **kw))
        params = enc.init(jax.random.key(2))
        params["temporal_attention_bias"]["embedding"] = jnp.asarray(
            np.random.default_rng(3).normal(size=(8, 2)).astype(np.float32))
        rng = np.random.default_rng(4)
        ids = jnp.asarray(rng.integers(3, 60, size=(2, 12)).astype(np.int32))
        mask = jnp.asarray((np.arange(12)[None, :] < np.array([[12], [7]]))
                           .astype(np.int32))
        ts = jnp.asarray((1_600_000_000 + np.cumsum(
            rng.integers(60, 9000, size=(2, 12)), axis=1)).astype(np.int32))
        out_r = enc.apply(params, ids * mask, mask, input_timestamps=ts)
        out_f = enc_fused.apply(params, ids * mask, mask,
                                input_timestamps=ts)
        np.testing.assert_allclose(
            np.asarray(out_f["sequence_output"]),
            np.asarray(out_r["sequence_output"]), rtol=2e-2, atol=5e-3)

    def test_fused_model_grads_flow(self):
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        cfg = BERT4RecConfig(vocab_size=50, hidden_size=32, num_layers=2,
                             num_attention_heads=4, inner_dim=64,
                             max_sequence_length=12,
                             max_predictions_per_seq=2,
                             use_fused_layer=True)
        model = BERT4RecModel(config=cfg)
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        batch = {
            "input_word_ids": jnp.asarray(
                rng.integers(3, 50, size=(2, 12)).astype(np.int32)),
            "input_mask": jnp.ones((2, 12), jnp.int32),
            "masked_lm_positions": jnp.asarray([[1, 4], [0, 3]], jnp.int32),
            "masked_lm_ids": jnp.asarray([[5, 6], [7, 8]], jnp.int32),
        }

        def loss(p):
            out = model.apply(p, batch)
            from bert4rec_tpu.trainers import trainer_utils
            return trainer_utils.masked_sparse_categorical_crossentropy(
                batch["masked_lm_ids"], out["mlm_logits"])

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        for leaf in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()
        # encoder layer weights receive non-zero grads through the kernel
        g = grads["encoder"]["layers"]["layer_0"]["intermediate"]["kernel"]
        assert np.abs(np.asarray(g)).max() > 0

    def test_fused_kernels_under_mesh(self):
        """Pallas custom calls run correctly (if replicated) under a DP
        mesh — smoke-checks the GSPMD interaction on 8 virtual devices."""
        from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
        from bert4rec_tpu.dataloaders.processed_dataset import (
            MaskingConfig, ProcessedDataset,
        )
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        from bert4rec_tpu.trainers import BERT4RecTrainer

        mesh = create_mesh(MeshConfig(model_parallelism=1))
        rng = np.random.default_rng(0)
        seqs = [rng.integers(3, 43, size=12).astype(np.int32)
                for _ in range(64)]
        cfg = MaskingConfig(max_seq_len=16, max_predictions_per_seq=4,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2,
                            masked_lm_rate=0.3)
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=43, hidden_size=32, num_layers=2,
            num_attention_heads=4, inner_dim=64, max_sequence_length=16,
            max_predictions_per_seq=4, use_fused_layer=True,
            use_fused_loss=True, output_dropout=0.0, attention_dropout=0.0))
        trainer = BERT4RecTrainer(model, mesh=mesh)
        trainer.initialize_model(rng=jax.random.key(0))
        h = trainer.train(ProcessedDataset(seqs, cfg, lambda: 43),
                          epochs=1, batch_size=32, verbose=False)
        assert np.isfinite(h.history["loss"][0])
