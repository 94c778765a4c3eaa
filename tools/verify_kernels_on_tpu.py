"""Hardware verification of the Pallas kernels (run on a real TPU).

The CPU test suite exercises the kernels in interpret mode, but interpret
mode stubs ``pltpu.prng_random_bits`` with zeros, so the in-kernel dropout
paths can only be validated on hardware. Run:

    python tools/verify_kernels_on_tpu.py

Checks: forward parity vs the XLA reference, backward-kernel gradients vs
XLA autodiff (rate=0), dropout determinism per seed, dropout-mean
unbiasedness, and finite-difference gradients with dropout active
(exactly-linear dV tightly; dQ with a large step — fp32-on-MXU loss noise
makes small-eps central differences unreliable at S=200 scale).
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.ops.flash_attention import flash_attention, mha_reference


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    B, N, S, D = 4, 4, 200, 32
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, S, D)).astype(np.float32))
               for _ in range(3))
    lengths = rng.integers(5, S + 1, size=B)
    mask = jnp.asarray((np.arange(S)[None, :] < lengths[:, None])
                       .astype(np.int32))

    # 1. forward parity (rate=0) — bf16-pass fp32 MXU => ~1e-3
    out = flash_attention(q, k, v, mask, interpret=False)
    ref = mha_reference(q, k, v, mask)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    print("fwd max err (rate=0):", err)
    assert err < 5e-3

    # 2. backward kernel vs XLA autodiff (rate=0)
    def loss_pl(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, interpret=False) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, mask) ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_pl, g_ref):
        e = np.abs(np.asarray(a) - np.asarray(b)).max()
        rel = e / (np.abs(np.asarray(b)).max() + 1e-9)
        print(f"grad d{name} max abs err: {e:.3e} rel {rel:.3e}")
        assert rel < 2e-2, (name, rel)

    # 3. dropout determinism + unbiasedness
    a = flash_attention(q, k, v, mask, dropout_rate=0.4, seed=7,
                        interpret=False)
    b = flash_attention(q, k, v, mask, dropout_rate=0.4, seed=7,
                        interpret=False)
    c = flash_attention(q, k, v, mask, dropout_rate=0.4, seed=8,
                        interpret=False)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    acc = np.zeros_like(np.asarray(ref))
    n = 64
    for s_ in range(n):
        acc += np.asarray(flash_attention(q, k, v, mask, dropout_rate=0.4,
                                          seed=s_, interpret=False))
    mean = (acc / n).reshape(-1)
    rf = np.asarray(ref).reshape(-1)
    corr = np.corrcoef(mean, rf)[0, 1]
    scale = np.abs(mean).mean() / np.abs(rf).mean()
    print("dropout mean corr vs no-dropout:", corr, "scale ratio:", scale)
    assert corr > 0.97 and abs(scale - 1) < 0.1

    # 4. dropout backward finite differences
    proj = jnp.asarray(rng.normal(size=(B, N, S, D)).astype(np.float32))

    def loss_do(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, dropout_rate=0.3,
                                       seed=5, interpret=False) * proj)

    g = jax.grad(loss_do, argnums=(0, 1, 2))(q, k, v)

    def fd(argi, idx, eps):
        args = [q, k, v]
        flat = np.zeros(np.asarray(args[argi]).size, np.float32)
        flat[idx] = eps
        dx = jnp.asarray(flat.reshape(args[argi].shape))
        args_p = list(args); args_p[argi] = args[argi] + dx
        args_m = list(args); args_m[argi] = args[argi] - dx
        return (float(loss_do(*args_p)) - float(loss_do(*args_m))) / (2 * eps)

    # dV: output exactly linear in v for a fixed mask -> tight check
    idx = 12345 % (B * N * S * D)
    an_v = float(np.asarray(g[2]).reshape(-1)[idx])
    fd_v = fd(2, idx, 1e-2)
    print(f"dV analytic {an_v:.5f} fd {fd_v:.5f}")
    assert abs(an_v - fd_v) < max(3e-2, 0.03 * abs(fd_v))

    # dQ: nonlinear; large step drowns bf16-pass loss noise
    an_q = float(np.asarray(g[0]).reshape(-1)[idx])
    fd_q = fd(0, idx, 0.2)
    print(f"dQ analytic {an_q:.5f} fd {fd_q:.5f}")
    assert abs(an_q - fd_q) < max(6e-2, 0.15 * abs(fd_q)), (an_q, fd_q)

    # 5. causal (SASRec) path: Mosaic lowering of the in-kernel iota
    # triangle — fwd + grads vs the XLA reference
    out_c = flash_attention(q, k, v, mask, interpret=False, causal=True)
    ref_c = mha_reference(q, k, v, mask, causal=True)
    err_c = np.abs(np.asarray(out_c) - np.asarray(ref_c)).max()
    print("causal fwd max err (rate=0):", err_c)
    assert err_c < 5e-3
    assert np.abs(np.asarray(ref_c) - np.asarray(ref)).max() > 1e-3
    # the flag must reach the hardware kernel, not just the reference
    kernel_delta = np.abs(np.asarray(out_c) - np.asarray(out)).max()
    print("causal vs bidir kernel output delta:", kernel_delta)
    assert kernel_delta > 1e-3

    def loss_pl_c(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, interpret=False,
                                       causal=True) ** 2)

    def loss_ref_c(q, k, v):
        return jnp.sum(mha_reference(q, k, v, mask, causal=True) ** 2)

    g_pl_c = jax.grad(loss_pl_c, argnums=(0, 1, 2))(q, k, v)
    g_ref_c = jax.grad(loss_ref_c, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_pl_c, g_ref_c):
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        print(f"causal grad d{name} rel err: {rel:.3e}")
        assert rel < 2e-2, (name, rel)

    print("ALL TPU KERNEL CHECKS PASSED")




def verify_fused_layer():
    """Hardware checks for ops/fused_encoder_layer.py (dropout needs the
    TPU PRNG; rate=0 parity is also covered by the CPU suite)."""
    import jax.numpy as jnp
    from bert4rec_tpu.models.components import layers as L
    from bert4rec_tpu.models.components.transformer import (
        init_transformer_block, transformer_block,
    )
    from bert4rec_tpu.ops.fused_encoder_layer import fused_encoder_layer

    B, S, H, N, F = 4, 200, 128, 4, 512
    params = init_transformer_block(jax.random.key(0), H, N, F, 0.02)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32) * 0.5)
    lengths = rng.integers(5, S + 1, size=B)
    mask = jnp.asarray((np.arange(S)[None, :] < lengths[:, None])
                       .astype(np.int32))

    ref = transformer_block(
        params, x, L.self_attention_mask(mask), num_heads=N,
        inner_activation=L.get_activation("gelu_approx"),
        output_dropout=0.0, attention_dropout=0.0, training=False,
        norm_first=False, compute_dtype=jnp.float32)
    out = fused_encoder_layer(params, x, mask, num_heads=N, interpret=False)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    print("fused layer fwd max err (rate=0):", err)
    assert err < 2e-2, err  # bf16-pass fp32 MXU across 6 chained matmuls

    # causal (SASRec) triangle lowering
    idx_s = jnp.arange(S)
    tri = jnp.where(idx_s[None, :] <= idx_s[:, None], 0.0, -1e9)[None, None]
    ref_c = transformer_block(
        params, x, L.self_attention_mask(mask) + tri, num_heads=N,
        inner_activation=L.get_activation("gelu_approx"),
        output_dropout=0.0, attention_dropout=0.0, training=False,
        norm_first=False, compute_dtype=jnp.float32)
    out_c = fused_encoder_layer(params, x, mask, num_heads=N,
                                interpret=False, causal=True)
    err_c = np.abs(np.asarray(out_c) - np.asarray(ref_c)).max()
    print("fused layer causal fwd max err (rate=0):", err_c)
    assert err_c < 2e-2, err_c
    assert np.abs(np.asarray(ref_c) - np.asarray(ref)).max() > 1e-3

    # dropout determinism + unbiasedness on hardware
    a = fused_encoder_layer(params, x, mask, num_heads=N,
                            attention_dropout=0.2, output_dropout=0.5,
                            seed=3, interpret=False)
    b = fused_encoder_layer(params, x, mask, num_heads=N,
                            attention_dropout=0.2, output_dropout=0.5,
                            seed=3, interpret=False)
    c = fused_encoder_layer(params, x, mask, num_heads=N,
                            attention_dropout=0.2, output_dropout=0.5,
                            seed=4, interpret=False)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    acc = np.zeros_like(np.asarray(ref))
    n = 32
    for s_ in range(n):
        acc += np.asarray(fused_encoder_layer(
            params, x, mask, num_heads=N, attention_dropout=0.2,
            output_dropout=0.5, seed=s_, interpret=False))
    corr = np.corrcoef((acc / n).reshape(-1),
                       np.asarray(ref).reshape(-1))[0, 1]
    print("fused layer dropout mean corr:", corr)
    assert corr > 0.9, corr

    # dropout backward: dV-style linear check via a weight that enters
    # linearly after all dropout sites (output_norm scale)
    proj = jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32))

    def loss(params):
        return jnp.sum(fused_encoder_layer(
            params, x, mask, num_heads=N, attention_dropout=0.2,
            output_dropout=0.5, seed=11, interpret=False) * proj)

    g = jax.grad(loss)(params)
    eps = 1e-2
    p_plus = jax.tree.map(lambda v: v, params)
    p_minus = jax.tree.map(lambda v: v, params)
    scale_arr = np.asarray(params["output_norm"]["scale"]).copy()
    delta = np.zeros_like(scale_arr); delta[7] = eps
    p_plus["output_norm"]["scale"] = jnp.asarray(scale_arr + delta)
    p_minus["output_norm"]["scale"] = jnp.asarray(scale_arr - delta)
    fd = (float(loss(p_plus)) - float(loss(p_minus))) / (2 * eps)
    an = float(np.asarray(g["output_norm"]["scale"])[7])
    print(f"fused layer dropout dscale: analytic {an:.5f} fd {fd:.5f}")
    assert abs(an - fd) < max(5e-2, 0.05 * abs(fd)), (an, fd)
    print("FUSED LAYER TPU CHECKS PASSED")


# the Reddit catalog width (335,420 items + 3 specials, tools/quality_run
# reddit preset) padded to the tiled kernel's 1024-wide vocab blocks
REDDIT_VOCAB = 335423
REDDIT_VOCAB_PADDED = REDDIT_VOCAB + ((-REDDIT_VOCAB) % 1024)


def verify_tiled_loss_reddit():
    verify_tiled_loss(vs=REDDIT_VOCAB, v=REDDIT_VOCAB_PADDED)


def verify_tiled_loss(vs=26732, v=26752):
    """Vocab-tiled flash-softmax loss vs XLA autodiff at ML-20M vocab
    scale (the tiling path the small CPU tests exercise only in
    interpret mode). Called a second time at the Reddit width (335k,
    328 vocab tiles) — the online-softmax merge chain is ~12x longer
    there and deserves its own hardware check."""
    import jax.numpy as jnp
    from bert4rec_tpu.ops.fused_mlm_loss import fused_mlm_loss_tiled
    from bert4rec_tpu.trainers import trainer_utils

    rng = np.random.default_rng(0)
    rows, w = 300, 128
    hidden = jnp.asarray(rng.normal(size=(rows, w)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32) * 0.1)
    labels_np = rng.integers(0, vs, size=rows).astype(np.int32)
    labels_np[::9] = 0
    labels = jnp.asarray(labels_np)

    def loss_tiled(h, t, b):
        return fused_mlm_loss_tiled(h, t, b, labels, vs, False)[0]

    def loss_xla(h, t, b):
        logits = (h @ t.T + b)[None]
        col = jnp.arange(t.shape[0])[None, None, :]
        logits = jnp.where(col >= vs, -1e9, logits)
        return trainer_utils.masked_sparse_categorical_crossentropy(
            labels[None], logits)

    lt = float(jax.jit(loss_tiled)(hidden, table, bias))
    lx = float(jax.jit(loss_xla)(hidden, table, bias))
    print("tiled loss fwd delta:", abs(lt - lx))
    assert abs(lt - lx) < 1e-3
    gt = jax.jit(jax.grad(loss_tiled, argnums=(0, 1, 2)))(hidden, table,
                                                          bias)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(hidden, table,
                                                        bias)
    for name, a, b in zip("htb", gt, gx):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        print(f"tiled loss grad d{name} rel err {rel:.2e}")
        assert rel < 5e-3, name
    print(f"TILED LOSS TPU CHECKS PASSED (vocab {vs})")


def verify_fused_temporal():
    """Fused-layer temporal attention (dense per-head rel bias STREAMED
    into the kernel, dScores streamed back out for the table grad) vs
    the XLA dense-bias path on real hardware — fwd + grads including
    d(temporal_attention_bias). The [n*S, S] block DMA in/out and the
    per-bucket fused reductions of the lookup VJP only prove out on
    Mosaic/XLA-TPU, not in interpret mode."""
    import jax.numpy as jnp
    from bert4rec_tpu.models import BERT4RecConfig, Bert4RecEncoder

    kw = dict(vocab_size=200, hidden_size=64, num_layers=2,
              num_attention_heads=4, inner_dim=128,
              max_sequence_length=32, use_temporal_attention=True,
              temporal_attention_buckets=64,
              attention_dropout=0.0, output_dropout=0.0)
    enc = Bert4RecEncoder(BERT4RecConfig(**kw))
    enc_fused = Bert4RecEncoder(BERT4RecConfig(use_fused_layer=True, **kw))
    params = enc.init(jax.random.key(0))
    rng = np.random.default_rng(5)
    params["temporal_attention_bias"]["embedding"] = jnp.asarray(
        rng.normal(size=(64, 4)).astype(np.float32) * 0.3)
    ids = jnp.asarray(rng.integers(3, 200, size=(4, 32)).astype(np.int32))
    mask = jnp.asarray((np.arange(32)[None, :]
                        < np.array([[32], [20], [32], [9]])).astype(np.int32))
    ts = jnp.asarray((1_600_000_000 + np.cumsum(
        rng.integers(60, 500_000, size=(4, 32)), axis=1)).astype(np.int32))

    def run(e):
        def f(p):
            return e.apply(p, ids * mask, mask,
                           input_timestamps=ts)["sequence_output"]
        return f

    out_r = jax.jit(run(enc))(params)
    out_f = jax.jit(run(enc_fused))(params)
    err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                - out_r.astype(jnp.float32))))
    print(f"fused temporal fwd max err: {err:.2e}")
    assert err < 5e-2  # tanh-approx gelu systematic difference included

    proj = jnp.asarray(rng.normal(size=out_r.shape), jnp.float32)

    def loss(e):
        def f(p):
            return jnp.sum(run(e)(p).astype(jnp.float32) * proj)
        return f

    g_r = jax.jit(jax.grad(loss(enc)))(params)
    g_f = jax.jit(jax.grad(loss(enc_fused)))(params)
    tr = np.asarray(g_r["temporal_attention_bias"]["embedding"])
    tf = np.asarray(g_f["temporal_attention_bias"]["embedding"])
    assert np.abs(tr).max() > 0
    rel = np.abs(tf - tr).max() / np.abs(tr).max()
    print(f"fused temporal dtable rel err {rel:.2e}")
    assert rel < 2e-2
    print("FUSED TEMPORAL TPU CHECKS PASSED")


def verify_flash_bert_base_shape():
    """Flash attention at the reference-default encoder shape (12 heads,
    S=512, D=64): the head-group estimator picks hpc < n_heads here, so
    this exercises the (batch, head-group) grid the small-shape checks
    never reach. rate=0 fwd + grads vs the XLA reference."""
    import importlib

    import jax.numpy as jnp
    # ops/__init__ re-exports the flash_attention FUNCTION under the same
    # name, shadowing the submodule as a package attribute — bind the
    # MODULE via sys.modules
    fa = importlib.import_module("bert4rec_tpu.ops.flash_attention")

    b, n, s, d = 2, 12, 512, 64
    hpc = fa._heads_per_cell(n, s, d, 2)
    assert hpc < n, f"estimator picked hpc={hpc}; shape no longer splits"
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32)
                           * 0.1).astype(jnp.bfloat16) for _ in range(3))
    mask = jnp.asarray((rng.random((b, s)) > 0.1).astype(np.int32))
    mask = mask.at[:, :4].set(1)

    proj = jnp.asarray(rng.normal(size=(b, n, s, d)), jnp.float32)

    def out_sum(fn, *args):
        return jnp.sum(fn(*args).astype(jnp.float32) * proj)

    f_pl = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v, mask))
    f_ref = jax.jit(lambda q, k, v: fa.mha_reference(q, k, v, mask))
    o_pl, o_ref = f_pl(q, k, v), f_ref(q, k, v)
    err = float(jnp.max(jnp.abs(o_pl.astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    print(f"bert-base-shape flash fwd max err (hpc={hpc}): {err:.2e}")
    assert err < 2e-2

    g_pl = jax.jit(jax.grad(lambda q, k, v: out_sum(f_pl, q, k, v),
                            argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(lambda q, k, v: out_sum(f_ref, q, k, v),
                             argnums=(0, 1, 2)))(q, k, v)
    for name, a, bb in zip("qkv", g_pl, g_ref):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        rel = np.abs(a - bb).max() / (np.abs(bb).max() + 1e-9)
        print(f"bert-base-shape flash grad d{name} rel err {rel:.2e}")
        assert rel < 5e-2, name
    print("BERT-BASE-SHAPE FLASH CHECKS PASSED")


def verify_tiled_loss_bf16(vs=26732, v=26752):
    """Quantify the bf16-policy cost of the vocab-tiled loss (VERDICT r2
    next-step #2): under DTypePolicy.bf16 the kernel computes logits from
    bf16 hidden x bf16 table blocks (the table is pre-cast once so the
    grid streams half the bytes — ops/fused_mlm_loss.py _stream_table).

    Two comparisons:
      (a) kernel-vs-XLA at the SAME bf16 policy (both form logits from
          bf16 operands with fp32 accumulation) — must agree tightly;
      (b) both vs the all-fp32 oracle — the cost of bf16 itself, reported
          and bounded loosely (input rounding, not kernel error).
    """
    import jax.numpy as jnp
    from bert4rec_tpu.ops.fused_mlm_loss import fused_mlm_loss_tiled
    from bert4rec_tpu.trainers import trainer_utils

    rng = np.random.default_rng(1)
    rows, w = 300, 128
    hidden32 = rng.normal(size=(rows, w)).astype(np.float32)
    hidden = jnp.asarray(hidden32).astype(jnp.bfloat16)
    table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32) * 0.1)
    labels_np = rng.integers(0, vs, size=rows).astype(np.int32)
    labels_np[::9] = 0
    labels = jnp.asarray(labels_np)

    def loss_tiled(h, t, b):
        return fused_mlm_loss_tiled(h, t, b, labels, vs, False)[0]

    def xla_loss(h, t, b):
        # genuinely same-policy: bf16 operands, fp32 ACCUMULATION — the
        # kernel never rounds the accumulated logits to bf16, so a plain
        # bf16 @ would add a per-logit rounding the kernel doesn't have
        logits = jax.lax.dot_general(
            h, t.astype(h.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[None] + b
        col = jnp.arange(t.shape[0])[None, None, :]
        logits = jnp.where(col >= vs, -1e9, logits)
        return trainer_utils.masked_sparse_categorical_crossentropy(
            labels[None], logits)

    lt = float(jax.jit(loss_tiled)(hidden, table, bias))
    lx = float(jax.jit(xla_loss)(hidden, table, bias))
    l32 = float(jax.jit(xla_loss)(jnp.asarray(hidden32), table, bias))
    print(f"bf16 tiled loss: kernel {lt:.6f}  xla-bf16 {lx:.6f}  "
          f"fp32-oracle {l32:.6f}")
    assert abs(lt - lx) < 2e-3, "kernel disagrees with same-policy XLA"
    assert abs(lt - l32) / max(abs(l32), 1e-9) < 2e-2, \
        "bf16 policy cost exceeds expected rounding envelope"

    gt = jax.jit(jax.grad(loss_tiled, argnums=(1, 2)))(hidden, table, bias)
    g32 = jax.jit(jax.grad(xla_loss, argnums=(1, 2)))(
        jnp.asarray(hidden32), table, bias)
    for name, a, b in zip(("t", "b"), gt, g32):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        print(f"bf16 tiled grad d{name} rel err vs fp32 oracle {rel:.2e}")
        assert rel < 5e-2, name
    print(f"BF16 TILED LOSS QUANTIFIED (vocab {vs})")


if __name__ == "__main__":
    main()
    verify_fused_layer()
    verify_tiled_loss()
    verify_tiled_loss_reddit()
    verify_tiled_loss_bf16()
    verify_flash_bert_base_shape()
    verify_fused_temporal()
