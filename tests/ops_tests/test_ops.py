"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.ops import (
    flash_attention, mha_reference, score_candidates,
    score_candidates_reference,
)

B, N, S, D = 2, 4, 24, 16


def make_qkv(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, S, D)).astype(np.float32),
                           dtype=dtype) for _ in range(3))
    lengths = rng.integers(4, S + 1, size=B)
    mask = jnp.asarray((np.arange(S)[None, :] < lengths[:, None])
                       .astype(np.int32))
    return q, k, v, mask


class TestFlashAttention:

    def test_matches_reference(self):
        q, k, v, mask = make_qkv()
        out = flash_attention(q, k, v, mask, interpret=True)
        ref = mha_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_matches_reference(self):
        q, k, v, mask = make_qkv(dtype=jnp.bfloat16)
        out = flash_attention(q, k, v, mask, interpret=True)
        ref = mha_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32),
            np.asarray(ref, dtype=np.float32), rtol=5e-2, atol=5e-2)

    def test_gradient_flows(self):
        q, k, v, mask = make_qkv()

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, mask, interpret=True))

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, mask))

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for g, r in zip(grads, ref_grads):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

    def test_head_grouped_grid_matches_all_heads(self, monkeypatch):
        """At reference-default scale the VMEM estimator splits heads into
        groups (hpc < n_heads); every shipped test shape keeps hpc ==
        n_heads, so force the split here and assert the (batch,
        head-group) grid is bit-exact vs the all-heads grid and matches
        the XLA reference — fwd and grads (interpret mode)."""
        import importlib
        fa = importlib.import_module("bert4rec_tpu.ops.flash_attention")
        q, k, v, mask = make_qkv()

        def run():
            out = flash_attention(q, k, v, mask, interpret=True)

            def loss(q, k, v):
                return jnp.sum(
                    flash_attention(q, k, v, mask, interpret=True))

            return out, jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        out_all, grads_all = run()
        n, s, d = q.shape[1], q.shape[2], q.shape[3]
        assert fa._heads_per_cell(n, s, d, q.dtype.itemsize) == n
        monkeypatch.setattr(fa, "_VMEM_BUDGET",
                            12 * s * s * 4 + 8 * 2 * s * d * 4)
        hpc = fa._heads_per_cell(n, s, d, q.dtype.itemsize)
        assert 1 <= hpc < n, hpc
        out_grp, grads_grp = run()
        np.testing.assert_array_equal(np.asarray(out_all),
                                      np.asarray(out_grp))
        for g_all, g_grp in zip(grads_all, grads_grp):
            np.testing.assert_array_equal(np.asarray(g_all),
                                          np.asarray(g_grp))
        ref = mha_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out_grp), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_causal_matches_reference(self):
        q, k, v, mask = make_qkv()
        out = flash_attention(q, k, v, mask, interpret=True, causal=True)
        ref = mha_reference(q, k, v, mask, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # the triangle matters: causal != bidirectional on this input
        bidir = mha_reference(q, k, v, mask)
        assert np.abs(np.asarray(ref) - np.asarray(bidir)).max() > 1e-3

    def test_causal_future_independence(self):
        """Row i of the kernel output must not see keys/values at j > i."""
        q, k, v, mask = make_qkv()
        out1 = flash_attention(q, k, v, mask, interpret=True, causal=True)
        k2 = k.at[:, :, 12:].add(3.0)
        v2 = v.at[:, :, 12:].add(3.0)
        out2 = flash_attention(q, k2, v2, mask, interpret=True, causal=True)
        np.testing.assert_allclose(np.asarray(out1[:, :, :12]),
                                   np.asarray(out2[:, :, :12]),
                                   rtol=1e-6, atol=1e-6)

    def test_causal_gradient_matches_reference(self):
        q, k, v, mask = make_qkv()

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, mask, interpret=True,
                                           causal=True))

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, mask, causal=True))

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for g, r in zip(grads, ref_grads):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

    def test_dropout_deterministic_per_seed(self):
        q, k, v, mask = make_qkv()
        a = flash_attention(q, k, v, mask, dropout_rate=0.3, seed=7,
                            interpret=True)
        b = flash_attention(q, k, v, mask, dropout_rate=0.3, seed=7,
                            interpret=True)
        c = flash_attention(q, k, v, mask, dropout_rate=0.3, seed=8,
                            interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_dropout_statistics(self):
        """Mean output over many seeds approximates the no-dropout output
        (inverted dropout is unbiased)."""
        q, k, v, mask = make_qkv()
        ref = flash_attention(q, k, v, mask, dropout_rate=0.0,
                              interpret=True)
        acc = np.zeros_like(np.asarray(ref))
        n = 48
        for seed in range(n):
            acc += np.asarray(flash_attention(
                q, k, v, mask, dropout_rate=0.4, seed=seed, interpret=True))
        mean = (acc / n).reshape(-1)
        ref_flat = np.asarray(ref).reshape(-1)
        # unbiased estimator: high correlation + matching scale
        corr = np.corrcoef(mean, ref_flat)[0, 1]
        assert corr > 0.97, corr
        np.testing.assert_allclose(np.abs(mean).mean(),
                                   np.abs(ref_flat).mean(), rtol=0.1)

    def test_dropout_gradient_matches_finite_difference(self):
        """The pallas backward regenerates the same dropout mask as the
        forward: grads must match central finite differences."""
        rng = np.random.default_rng(3)
        b, n, s, d = 1, 2, 8, 4
        q, k, v = (jnp.asarray(rng.normal(size=(b, n, s, d))
                               .astype(np.float32)) for _ in range(3))
        mask = jnp.ones((b, s), jnp.int32)
        proj = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))

        def loss(q, k, v):
            out = flash_attention(q, k, v, mask, dropout_rate=0.3, seed=5,
                                  interpret=True)
            return jnp.sum(out * proj)

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        eps = 1e-3
        for argi, (name, x) in enumerate([("q", q), ("k", k), ("v", v)]):
            flat = np.asarray(x).reshape(-1)
            for idx in [0, 7, 19]:
                delta = np.zeros_like(flat)
                delta[idx] = eps
                dx = jnp.asarray(delta.reshape(x.shape))
                args = [q, k, v]
                args_p = list(args); args_p[argi] = args[argi] + dx
                args_m = list(args); args_m[argi] = args[argi] - dx
                fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
                an = float(np.asarray(grads[argi]).reshape(-1)[idx])
                np.testing.assert_allclose(an, fd, rtol=2e-2, atol=2e-3,
                                           err_msg=f"{name}[{idx}]")

    def test_kernel_dropout_on_tpu(self):
        """In-kernel PRNG dropout semantics — needs real TPU (interpret
        mode stubs prng_random_bits with zeros)."""
        if jax.devices()[0].platform != "tpu":
            pytest.skip("pallas PRNG requires a real TPU")
        q, k, v, mask = make_qkv()
        ref = flash_attention(q, k, v, mask, dropout_rate=0.0,
                              interpret=False)
        a = flash_attention(q, k, v, mask, dropout_rate=0.4, seed=7,
                            interpret=False)
        b = flash_attention(q, k, v, mask, dropout_rate=0.4, seed=7,
                            interpret=False)
        c = flash_attention(q, k, v, mask, dropout_rate=0.4, seed=8,
                            interpret=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))
        acc = np.zeros_like(np.asarray(ref))
        n = 32
        for seed in range(n):
            acc += np.asarray(flash_attention(
                q, k, v, mask, dropout_rate=0.4, seed=seed, interpret=False))
        np.testing.assert_allclose(acc / n, np.asarray(ref),
                                   rtol=0.5, atol=0.15)

    def test_long_sequence_falls_back(self):
        rng = np.random.default_rng(0)
        s = 2048  # > MAX_FUSED_SEQ_LEN
        q = k = v = jnp.asarray(rng.normal(size=(1, 1, s, 8))
                                .astype(np.float32))
        mask = jnp.ones((1, s), jnp.int32)
        out = flash_attention(q, k, v, mask)
        ref = mha_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestCandidateScoring:

    def test_matches_full_vocab_gather(self):
        rng = np.random.default_rng(0)
        b, p, c, v, w = 3, 5, 11, 64, 16
        hidden = jnp.asarray(rng.normal(size=(b, p, w)).astype(np.float32))
        table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32))
        candidates = jnp.asarray(rng.integers(0, v, size=(b, p, c))
                                 .astype(np.int32))
        out = score_candidates(hidden, table, bias, candidates)
        ref = score_candidates_reference(hidden, table, bias, candidates)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestModelIntegration:

    def test_score_candidates_matches_apply(self):
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        cfg = BERT4RecConfig(vocab_size=80, hidden_size=32, num_layers=2,
                             num_attention_heads=4, inner_dim=64,
                             max_sequence_length=12,
                             max_predictions_per_seq=3)
        model = BERT4RecModel(config=cfg)
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        batch = {
            "input_word_ids": jnp.asarray(
                rng.integers(3, 80, size=(2, 12)).astype(np.int32)),
            "input_mask": jnp.ones((2, 12), jnp.int32),
            "masked_lm_positions": jnp.asarray(
                [[1, 4, 7], [0, 3, 9]], dtype=jnp.int32),
        }
        candidates = jnp.asarray(rng.integers(3, 80, size=(2, 3, 7))
                                 .astype(np.int32))
        cand_logits = model.score_candidates(params, batch, candidates)
        full = model.apply(params, batch)["mlm_logits"]
        expected = np.take_along_axis(np.asarray(full),
                                      np.asarray(candidates), axis=-1)
        np.testing.assert_allclose(np.asarray(cand_logits), expected,
                                   rtol=1e-4, atol=1e-4)

    def test_flash_encoder_matches_xla_encoder(self):
        from bert4rec_tpu.models import BERT4RecConfig, Bert4RecEncoder
        kw = dict(vocab_size=60, hidden_size=32, num_layers=2,
                  num_attention_heads=4, inner_dim=64,
                  max_sequence_length=16)
        enc_xla = Bert4RecEncoder(BERT4RecConfig(**kw))
        enc_flash = Bert4RecEncoder(
            BERT4RecConfig(use_flash_attention=True, **kw))
        params = enc_xla.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, 60, size=(2, 16)).astype(np.int32))
        mask = jnp.asarray((np.arange(16)[None, :] < np.array([[16], [9]]))
                           .astype(np.int32))
        out_xla = enc_xla.apply(params, ids * mask, mask)
        out_flash = enc_flash.apply(params, ids * mask, mask)
        np.testing.assert_allclose(
            np.asarray(out_flash["sequence_output"]),
            np.asarray(out_xla["sequence_output"]), rtol=2e-4, atol=2e-4)
