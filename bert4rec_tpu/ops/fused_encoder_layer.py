"""Fully fused post-LN transformer encoder layer (forward AND backward).

One Pallas grid cell processes one batch element end to end in VMEM:

    qkv projection -> per-head softmax attention (+ in-kernel prob dropout)
    -> output projection (+ dropout) -> residual -> LN1
    -> FFN (dense-gelu-dense, + dropout) -> residual -> LN2

The step-time ablation shows the two encoder layers are ~75% of the
ml-1m_128 train step and each is dominated by HBM passes between many
small XLA ops; fusing the whole layer leaves only x in / y out per layer
in HBM. The backward kernel recomputes every intermediate (and the SAME
dropout masks from the per-(batch, site) PRNG streams) and produces dx
plus all weight gradients; weight grads accumulate across the sequential
TPU grid into revisited output blocks.

Scope: post-LN only (the reference default, tfm ``norm_first=False``);
``query_range`` slicing and non-TPU platforms use the unfused path.
fp32 softmax/LN statistics; matmuls run in the input dtype with fp32
accumulation (same policy as the unfused path).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LN_EPS = 1e-12
MAX_FUSED_SEQ_LEN = 512

# per-core VMEM is ~16 MB; leave headroom for Mosaic's own buffers.
# calibrated against the largest measured-working config (hidden 256,
# inner 1024, S=200 ≈ 12.4 MB by this estimate)
VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def estimate_vmem_bytes(*, batch: int, seq_len: int, hidden: int,
                        inner_dim: int, dtype_bytes: int = 2,
                        temporal_heads: int = 0) -> int:
    """Rough upper bound on the backward kernel's VMEM working set.

    The backward pass (the larger of the two) holds, per grid cell:
    all layer weights plus fp32 grad accumulators (both whole-array VMEM
    blocks), the recomputed fp32 intermediates (qkv, per-head [S, S]
    score/prob/dropout mats, FFN pre/post activations, ~a dozen [S, H]
    temps), the x/dy/dx cell blocks in compute dtype, and the whole
    [B, S] mask. With a temporal bias, add the streamed per-head fp32
    rel-bias input block and the per-head dRel output block.
    """
    s, h, f = seq_len, hidden, inner_dim
    weight_elems = 4 * h * h + 2 * h * f          # wqkv+wo / w1+w2 (+eps)
    weights = 8 * weight_elems                    # fp32 input + fp32 grad
    activations = 4 * (13 * s * h + 3 * s * s + 3 * s * f)
    cell_blocks = 3 * s * h * dtype_bytes
    mask = batch * s * 4
    temporal = 2 * temporal_heads * s * s * 4 if temporal_heads else 0
    return weights + activations + cell_blocks + mask + temporal


def fused_layer_supported(*, batch: int, seq_len: int, hidden: int,
                          inner_dim: int, num_heads: int,
                          dtype_bytes: int = 2,
                          temporal: bool = False) -> bool:
    """Whether the whole-layer fusion can run for these dimensions.

    False routes callers to the flash-attention/XLA fallback instead of an
    opaque Mosaic VMEM-exhaustion error (e.g. the reference encoder
    defaults, hidden 768 / S 512, whose weights alone exceed VMEM)."""
    if seq_len > MAX_FUSED_SEQ_LEN:
        return False
    if hidden % num_heads != 0 or num_heads + 2 > _SITES_PER_CELL:
        return False
    est = estimate_vmem_bytes(batch=batch, seq_len=seq_len, hidden=hidden,
                              inner_dim=inner_dim, dtype_bytes=dtype_bytes,
                              temporal_heads=num_heads if temporal else 0)
    return est <= VMEM_BUDGET_BYTES

# dropout PRNG sites per batch element: heads 0..N-1, attn-out = N,
# ffn-out = N + 1
_SITES_PER_CELL = 64  # upper bound on n_heads + 2, keeps seeds disjoint


def _keep_scale(shape, rate):
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _site_seed(seed_ref, elem, site):
    pltpu.prng_seed(seed_ref[0] + elem * _SITES_PER_CELL + site)


def _dot(a, b, dims, out32=True):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32 if out32 else a.dtype)


def _ln_fwd(w, g, b):
    """Row layer norm, fp32; returns (y, xhat, rstd)."""
    w32 = w.astype(jnp.float32)
    mean = jnp.mean(w32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(w32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (w32 - mean) * rstd
    return xhat * g + b, xhat, rstd


def _ln_bwd(dy, xhat, rstd, g):
    """Input gradient of row layer norm (fp32)."""
    dxhat = dy * g
    mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rstd * (dxhat - mean1 - xhat * mean2)


_LOG2E = math.log2(math.e)


def _softmax_rows(s_mat):
    """Row softmax in fp32, tuned for the VPU: ``exp2`` of pre-scaled
    scores (one native VPU op; ``exp`` lowers to scale+exp2 anyway, this
    folds the scale into the cheap subtract) and a per-row reciprocal
    broadcast-multiply instead of an [S, S] divide."""
    m = jnp.max(s_mat, axis=-1, keepdims=True)
    e = jnp.exp2((s_mat - m) * _LOG2E)
    return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))


_GELU_C = math.sqrt(2.0 / math.pi)


def _gelu(x):
    """tanh-approximate GELU — Mosaic has no erf/erfc lowering; the
    approximation (max abs error ~1e-3) is the classic BERT formulation.
    The backward uses the exact derivative of this same approximation."""
    inner = _GELU_C * (x + 0.044715 * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _gelu_grad(x):
    inner = _GELU_C * (x + 0.044715 * x * x * x)
    t = jnp.tanh(inner)
    dinner = _GELU_C * (1.0 + 3.0 * 0.044715 * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * dinner


def _causal_bias(s):
    """[S, S] lower-triangular additive bias, rank-2 iota (Mosaic has no
    1-D iota); built in VMEM, never touches HBM."""
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return jnp.where(col <= row, 0.0, NEG_INF)


def _rel_heads_from_block(rel_all, n_heads):
    """Per-head [S, S] fp32 views of the STREAMED rel-bias block
    (``[n_heads*S, S]``, head-major). The bias is precomputed once per
    step by XLA (encoder ``_relative_time_bias``) and DMA'd per cell —
    at ml-1m_128 that is ~0.2 ms/layer-pass of HBM traffic, vs the ~13 ms
    of VPU select chains the in-kernel per-(bucket, head) rebuild cost
    (v5e measured: the rebuild made the temporal step 34.9 ms against
    8.5 ms non-temporal; the bucket law is VPU-bound, not HBM-bound)."""
    s = rel_all.shape[0] // n_heads
    return [rel_all[h * s:(h + 1) * s, :].astype(jnp.float32)
            for h in range(n_heads)]


def _attention_fwd(x, mask_row, wqkv, bqkv, n_heads, head_dim, scale,
                   attn_rate, seed_ref, elem, dtype, causal,
                   rel_heads=None):
    """x [S,H] -> (ctx [S,H], qkv [S,3H]); dropout applied to probs."""
    h_total = n_heads * head_dim
    qkv = _dot(x, wqkv, (((1,), (0,))))
    qkv = (qkv + bqkv).astype(dtype)                   # [S, 3H]
    bias = jnp.where(mask_row > 0, 0.0, NEG_INF)[None, :]
    if causal:
        bias = bias + _causal_bias(x.shape[0])

    ctx_heads = []
    for h in range(n_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, h_total + h * head_dim: h_total + (h + 1) * head_dim]
        v = qkv[:, 2 * h_total + h * head_dim: 2 * h_total + (h + 1) * head_dim]
        s_mat = _dot(q, k, (((1,), (1,)))) * scale + bias
        if rel_heads is not None:
            s_mat = s_mat + rel_heads[h]
        p = _softmax_rows(s_mat)                       # [S,S] fp32
        if attn_rate > 0.0:
            _site_seed(seed_ref, elem, h)
            p = p * _keep_scale(p.shape, attn_rate)
        ctx_heads.append(_dot(p.astype(dtype), v, (((1,), (0,)))))
    ctx = jnp.concatenate(ctx_heads, axis=-1).astype(dtype)  # [S, H]
    return ctx, qkv


def _layer_fwd_math(x, mask_row, wqkv, bqkv, wo, bo, g1, b1ln, w1, bf1,
                    w2, bf2, g2, b2ln, *, n_heads, head_dim, attn_rate,
                    out_rate, seed_ref, elem, dtype, causal,
                    rel_heads=None):
    """Shared forward math; returns all residuals needed by backward."""
    # matmul operands must share the compute dtype (params may be fp32)
    wqkv, wo = wqkv.astype(dtype), wo.astype(dtype)
    w1, w2 = w1.astype(dtype), w2.astype(dtype)
    scale = 1.0 / math.sqrt(head_dim)
    ctx, qkv = _attention_fwd(x, mask_row, wqkv, bqkv, n_heads, head_dim,
                              scale, attn_rate, seed_ref, elem, dtype,
                              causal, rel_heads=rel_heads)
    attn = _dot(ctx, wo, (((1,), (0,)))) + bo          # [S,H] fp32
    if out_rate > 0.0:
        _site_seed(seed_ref, elem, n_heads)
        keep2 = _keep_scale(attn.shape, out_rate)
        attn = attn * keep2
    else:
        keep2 = None
    u = x.astype(jnp.float32) + attn
    x1, xhat1, rstd1 = _ln_fwd(u, g1, b1ln)
    x1 = x1.astype(dtype)

    hpre = _dot(x1, w1, (((1,), (0,)))) + bf1          # [S,F] fp32
    hact = _gelu(hpre)
    f = _dot(hact.astype(dtype), w2, (((1,), (0,)))) + bf2   # [S,H] fp32
    if out_rate > 0.0:
        _site_seed(seed_ref, elem, n_heads + 1)
        keep3 = _keep_scale(f.shape, out_rate)
        f = f * keep3
    else:
        keep3 = None
    w_res = x1.astype(jnp.float32) + f
    y, xhat2, rstd2 = _ln_fwd(w_res, g2, b2ln)
    return dict(qkv=qkv, ctx=ctx, keep2=keep2, u=u, x1=x1, xhat1=xhat1,
                rstd1=rstd1, hpre=hpre, hact=hact, keep3=keep3,
                xhat2=xhat2, rstd2=rstd2, y=y)


def _fwd_kernel(seed_ref, x_ref, mask_ref, *rest, n_heads, head_dim,
                attn_rate, out_rate, cell_b, causal, has_rel):
    if has_rel:
        rel_ref = rest[0]
        rest = rest[1:]
    (wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, b1ln_ref, w1_ref,
     bf1_ref, w2_ref, bf2_ref, g2_ref, b2ln_ref, y_ref) = rest
    # several batch elements per grid cell amortize per-cell overhead
    for cb in range(cell_b):
        elem = pl.program_id(0) * cell_b + cb
        x = x_ref[cb]
        rel_heads = (_rel_heads_from_block(rel_ref[cb], n_heads)
                     if has_rel else None)
        res = _layer_fwd_math(
            x, mask_ref[elem],
            wqkv_ref[:], bqkv_ref[0], wo_ref[:], bo_ref[0],
            g1_ref[0], b1ln_ref[0], w1_ref[:], bf1_ref[0],
            w2_ref[:], bf2_ref[0], g2_ref[0], b2ln_ref[0],
            n_heads=n_heads, head_dim=head_dim, attn_rate=attn_rate,
            out_rate=out_rate, seed_ref=seed_ref, elem=elem, dtype=x.dtype,
            causal=causal, rel_heads=rel_heads)
        y_ref[cb] = res["y"].astype(y_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, mask_ref, *rest, n_heads, head_dim,
                attn_rate, out_rate, cell_b, causal, has_rel):
    if has_rel:
        rel_ref = rest[0]
        rest = rest[1:]
        drel_ref = rest[-1]
        rest = rest[:-1]
    else:
        rel_ref = drel_ref = None
    (wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref, b1ln_ref, w1_ref,
     bf1_ref, w2_ref, bf2_ref, g2_ref, b2ln_ref, dy_ref,
     dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref,
     db1ln_ref, dw1_ref, dbf1_ref, dw2_ref, dbf2_ref, dg2_ref,
     db2ln_ref) = rest
    dtype = x_ref.dtype
    wqkv = wqkv_ref[:].astype(dtype)
    wo = wo_ref[:].astype(dtype)
    w1 = w1_ref[:].astype(dtype)
    w2 = w2_ref[:].astype(dtype)
    g1, g2 = g1_ref[0], g2_ref[0]

    # weight-grad accumulators: grid runs sequentially, so init at cell 0
    # and += afterwards into the revisited blocks
    @pl.when(pl.program_id(0) == 0)
    def _():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        db1ln_ref[:] = jnp.zeros_like(db1ln_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dbf1_ref[:] = jnp.zeros_like(dbf1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dbf2_ref[:] = jnp.zeros_like(dbf2_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        db2ln_ref[:] = jnp.zeros_like(db2ln_ref)

    for cb in range(cell_b):
        _bwd_element(
            cb, pl.program_id(0) * cell_b + cb, dtype,
            seed_ref, x_ref, mask_ref, wqkv, wo, w1, w2, g1, g2,
            bqkv_ref, bo_ref, b1ln_ref, bf1_ref, bf2_ref, b2ln_ref,
            dy_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
            dg1_ref, db1ln_ref, dw1_ref, dbf1_ref, dw2_ref, dbf2_ref,
            dg2_ref, db2ln_ref, n_heads=n_heads, head_dim=head_dim,
            attn_rate=attn_rate, out_rate=out_rate, causal=causal,
            rel_ref=rel_ref, drel_ref=drel_ref)


def _bwd_element(cb, elem, dtype, seed_ref, x_ref, mask_ref, wqkv, wo, w1,
                 w2, g1, g2, bqkv_ref, bo_ref, b1ln_ref, bf1_ref, bf2_ref,
                 b2ln_ref, dy_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                 dbo_ref, dg1_ref, db1ln_ref, dw1_ref, dbf1_ref, dw2_ref,
                 dbf2_ref, dg2_ref, db2ln_ref, *, n_heads, head_dim,
                 attn_rate, out_rate, causal, rel_ref=None, drel_ref=None):
    x = x_ref[cb]
    mask_row = mask_ref[elem]
    rel_heads = (_rel_heads_from_block(rel_ref[cb], n_heads)
                 if rel_ref is not None else None)

    res = _layer_fwd_math(
        x, mask_row, wqkv, bqkv_ref[0], wo, bo_ref[0], g1, b1ln_ref[0],
        w1, bf1_ref[0], w2, bf2_ref[0], g2, b2ln_ref[0],
        n_heads=n_heads, head_dim=head_dim, attn_rate=attn_rate,
        out_rate=out_rate, seed_ref=seed_ref, elem=elem, dtype=dtype,
        causal=causal, rel_heads=rel_heads)

    dy = dy_ref[cb].astype(jnp.float32)

    # ---- LN2 ----
    dg2_ref[0] += jnp.sum(dy * res["xhat2"], axis=0)
    db2ln_ref[0] += jnp.sum(dy, axis=0)
    dw_res = _ln_bwd(dy, res["xhat2"], res["rstd2"], g2)   # [S,H]

    # ---- FFN branch ----
    df = dw_res if res["keep3"] is None else dw_res * res["keep3"]
    hact_t = res["hact"].astype(dtype)
    dw2_ref[:] += _dot(hact_t, df.astype(dtype), (((0,), (0,))))
    dbf2_ref[0] += jnp.sum(df, axis=0)
    dhact = _dot(df.astype(dtype), w2, (((1,), (1,))))     # [S,F]
    dhpre = dhact * _gelu_grad(res["hpre"])
    dw1_ref[:] += _dot(res["x1"], dhpre.astype(dtype), (((0,), (0,))))
    dbf1_ref[0] += jnp.sum(dhpre, axis=0)
    dx1 = dw_res + _dot(dhpre.astype(dtype), w1, (((1,), (1,))))

    # ---- LN1 ----
    dg1_ref[0] += jnp.sum(dx1 * res["xhat1"], axis=0)
    db1ln_ref[0] += jnp.sum(dx1, axis=0)
    du = _ln_bwd(dx1, res["xhat1"], res["rstd1"], g1)      # [S,H]

    # ---- attention output projection ----
    dattn = du if res["keep2"] is None else du * res["keep2"]
    dwo_ref[:] += _dot(res["ctx"], dattn.astype(dtype), (((0,), (0,))))
    dbo_ref[0] += jnp.sum(dattn, axis=0)
    dctx = _dot(dattn.astype(dtype), wo, (((1,), (1,))))   # [S,H]

    # ---- attention cores (recompute per head, same dropout streams) ----
    scale = 1.0 / math.sqrt(head_dim)
    h_total = n_heads * head_dim
    qkv = res["qkv"]
    bias = jnp.where(mask_row > 0, 0.0, NEG_INF)[None, :]
    if causal:
        bias = bias + _causal_bias(x.shape[0])
    s = x.shape[0]
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for h in range(n_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, h_total + h * head_dim: h_total + (h + 1) * head_dim]
        v = qkv[:, 2 * h_total + h * head_dim: 2 * h_total + (h + 1) * head_dim]
        s_mat = _dot(q, k, (((1,), (1,)))) * scale + bias
        if rel_heads is not None:
            s_mat = s_mat + rel_heads[h]
        p = _softmax_rows(s_mat)
        if attn_rate > 0.0:
            _site_seed(seed_ref, elem, h)
            keep1 = _keep_scale(p.shape, attn_rate)
            d_mat = p * keep1
        else:
            keep1 = None
            d_mat = p
        dctx_h = dctx[:, h * head_dim:(h + 1) * head_dim].astype(dtype)
        dv = _dot(d_mat.astype(dtype), dctx_h, (((0,), (0,))))
        dd = _dot(dctx_h, v, (((1,), (1,))))
        dp = dd if keep1 is None else dd * keep1
        ds32 = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if drel_ref is not None:
            # the rel bias adds directly to the scores, so dRel = dScores;
            # streamed out per head — the (bucket, head) scatter onto the
            # learned table happens in XLA (encoder _relative_time_bias
            # custom vjp), not in-kernel
            drel_ref[cb, h * s:(h + 1) * s, :] = ds32
        ds = ds32.astype(dtype)
        dq = _dot(ds, k, (((1,), (0,)))) * scale
        dk = _dot(ds, q, (((0,), (0,)))) * scale
        dqkv_parts_q.append(dq)
        dqkv_parts_k.append(dk)
        dqkv_parts_v.append(dv)
    dqkv = jnp.concatenate(
        dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=-1)  # [S, 3H]

    dwqkv_ref[:] += _dot(x, dqkv.astype(dtype), (((0,), (0,))))
    dbqkv_ref[0] += jnp.sum(dqkv, axis=0)
    dx = du + _dot(dqkv.astype(dtype), wqkv, (((1,), (1,))))
    dx_ref[cb] = dx.astype(dx_ref.dtype)


# --------------------------------------------------------------------------- #
# pallas_call plumbing
# --------------------------------------------------------------------------- #

def _whole(shape):
    """Whole-array block revisited by every grid cell."""
    return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _cell_b_for(b):
    """Batch elements per grid cell. Measured on v5e (ml-1m_128, B=256):
    cell_b=4 REGRESSES the step 9.4 vs 8.9 ms — grouping elements reduces
    the grid's DMA/compute pipelining more than it saves in per-cell
    overhead — so one element per cell is the default; the loop machinery
    stays for other shapes."""
    return 1


def _weight_specs(b, s, h, f, three_h, cell_b, rel_heads=0):
    specs = [
        pl.BlockSpec((cell_b, s, h), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),              # x
        _whole((b, s)),                                     # mask
    ]
    if rel_heads:
        # streamed per-head rel bias, head-major rows: [B, n_heads*S, S]
        specs += [
            pl.BlockSpec((cell_b, rel_heads * s, s),
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # rel bias
        ]
    specs += [
        _whole((h, three_h)), _whole((1, three_h)),         # wqkv, bqkv
        _whole((h, h)), _whole((1, h)),                     # wo, bo
        _whole((1, h)), _whole((1, h)),                     # g1, b1ln
        _whole((h, f)), _whole((1, f)),                     # w1, bf1
        _whole((f, h)), _whole((1, h)),                     # w2, bf2
        _whole((1, h)), _whole((1, h)),                     # g2, b2ln
    ]
    return specs


def _flat_weights(params):
    """Model layer-param dict -> flat 2-D operands (see transformer.py
    param layout: qkv kernel [H,3,N,D], output kernel [N,D,H])."""
    h = params["attention"]["qkv"]["kernel"].shape[0]
    three_h = 3 * h
    f = params["intermediate"]["kernel"].shape[1]
    return dict(
        wqkv=params["attention"]["qkv"]["kernel"].reshape(h, three_h),
        bqkv=params["attention"]["qkv"]["bias"].reshape(1, three_h),
        wo=params["attention"]["output"]["kernel"].reshape(h, h),
        bo=params["attention"]["output"]["bias"].reshape(1, h),
        g1=params["attention_norm"]["scale"].reshape(1, h),
        b1ln=params["attention_norm"]["bias"].reshape(1, h),
        w1=params["intermediate"]["kernel"],
        bf1=params["intermediate"]["bias"].reshape(1, f),
        w2=params["output"]["kernel"],
        bf2=params["output"]["bias"].reshape(1, h),
        g2=params["output_norm"]["scale"].reshape(1, h),
        b2ln=params["output_norm"]["bias"].reshape(1, h),
    )


_W_ORDER = ("wqkv", "bqkv", "wo", "bo", "g1", "b1ln", "w1", "bf1",
            "w2", "bf2", "g2", "b2ln")


def _run_forward(x, mask, flat, seed, rel, n_heads, attn_rate,
                 out_rate, interpret, causal):
    b, s, h = x.shape
    f = flat["w1"].shape[1]
    cell_b = _cell_b_for(b)
    rel_heads = n_heads if rel is not None else 0
    textra = () if rel is None else (rel,)
    kernel = functools.partial(
        _fwd_kernel, n_heads=n_heads, head_dim=h // n_heads,
        attn_rate=attn_rate, out_rate=out_rate, cell_b=cell_b,
        causal=causal, has_rel=rel is not None)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b // cell_b,),
        in_specs=_weight_specs(b, s, h, f, 3 * h, cell_b, rel_heads),
        out_specs=pl.BlockSpec((cell_b, s, h), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, h), x.dtype),
        interpret=interpret,
    )(seed, x, mask, *textra, *[flat[k] for k in _W_ORDER])


def _run_backward(x, mask, flat, seed, rel, dy, n_heads,
                  attn_rate, out_rate, interpret, causal):
    b, s, h = x.shape
    f = flat["w1"].shape[1]
    cell_b = _cell_b_for(b)
    rel_heads = n_heads if rel is not None else 0
    textra = () if rel is None else (rel,)
    kernel = functools.partial(
        _bwd_kernel, n_heads=n_heads, head_dim=h // n_heads,
        attn_rate=attn_rate, out_rate=out_rate, cell_b=cell_b,
        causal=causal, has_rel=rel is not None)
    in_specs = _weight_specs(b, s, h, f, 3 * h, cell_b, rel_heads) + [
        pl.BlockSpec((cell_b, s, h), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM)]               # dy
    out_specs = [pl.BlockSpec((cell_b, s, h), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)]      # dx
    out_shapes = [jax.ShapeDtypeStruct((b, s, h), x.dtype)]
    for name in _W_ORDER:
        shape = flat[name].shape
        out_specs.append(_whole(shape))
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
    if rel is not None:
        out_specs.append(
            pl.BlockSpec((cell_b, rel_heads * s, s),
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM))           # drel
        out_shapes.append(
            jax.ShapeDtypeStruct((b, rel_heads * s, s), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b // cell_b,),
        in_specs=in_specs, out_specs=out_specs)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=interpret,
    )(seed, x, mask, *textra, *[flat[k] for k in _W_ORDER], dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_layer(x, mask, flat_tuple, seed, rel, n_heads,
                 attn_rate, out_rate, interpret, causal):
    flat = dict(zip(_W_ORDER, flat_tuple))
    return _run_forward(x, mask, flat, seed, rel, n_heads,
                        attn_rate, out_rate, interpret, causal)


def _fused_fwd(x, mask, flat_tuple, seed, rel, n_heads,
               attn_rate, out_rate, interpret, causal):
    out = _fused_layer(x, mask, flat_tuple, seed, rel, n_heads,
                       attn_rate, out_rate, interpret, causal)
    return out, (x, mask, flat_tuple, seed, rel)


def _fused_bwd(n_heads, attn_rate, out_rate, interpret, causal, residuals,
               g):
    x, mask, flat_tuple, seed, rel = residuals
    flat = dict(zip(_W_ORDER, flat_tuple))
    outs = _run_backward(x, mask, flat, seed, rel, g, n_heads,
                         attn_rate, out_rate, interpret, causal)
    dx = outs[0]
    n_w = len(_W_ORDER)
    dflat = tuple(d.astype(w.dtype)
                  for d, w in zip(outs[1:1 + n_w], flat_tuple))
    drel = None if rel is None else outs[1 + n_w]
    return dx, None, dflat, None, drel


_fused_layer.defvjp(_fused_fwd, _fused_bwd)


def fused_encoder_layer(params: dict, x: jnp.ndarray,
                        input_mask: jnp.ndarray, *,
                        num_heads: int,
                        attention_dropout: float = 0.0,
                        output_dropout: float = 0.0,
                        seed=None,
                        interpret: bool = None,
                        causal: bool = False,
                        rel_bias: jnp.ndarray = None) -> jnp.ndarray:
    """Run one post-LN encoder layer fused in VMEM.

    :param params: the layer-param dict from
        transformer.init_transformer_block
    :param x: ``[B, S, H]``; ``input_mask``: ``[B, S]``
    :param causal: left-to-right attention (SASRec family); the triangle
        mask is an in-kernel iota compare, no dense bias in HBM.
    :param rel_bias: optional ``[B, n_heads, S, S]`` fp32 additive
        attention-score bias (TiSASRec-style relative-time bias,
        bert4rec_encoder._relative_time_bias), DIFFERENTIABLE: the
        backward kernel streams out dScores per head and autodiff chains
        them onto the learned (bucket, head) table in XLA. Precomputed
        once per step and DMA'd per cell: ~0.2 ms/layer-pass of HBM at
        ml-1m_128 vs the ~13 ms of VPU select chains an in-kernel
        per-(bucket, head) rebuild costs (v5e measured, r3 -> r4).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    rates_active = attention_dropout > 0.0 or output_dropout > 0.0
    if interpret and rates_active:
        raise ValueError(
            "fused_encoder_layer dropout needs a real TPU (interpret mode "
            "stubs the PRNG); gate on platform before calling.")
    if seed is None:
        seed = 0
    seed = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    flat = _flat_weights(params)
    flat_tuple = tuple(flat[k] for k in _W_ORDER)
    if rel_bias is not None:
        b, n, s, s2 = rel_bias.shape
        assert n == num_heads and s == s2 == x.shape[1], rel_bias.shape
        # head-major rows: one rank-3 [B, n*S, S] operand (rank-4 blocks
        # with two tiled trailing dims are not Mosaic-friendly)
        rel_bias = rel_bias.astype(jnp.float32).reshape(b, n * s, s)
    return _fused_layer(x, input_mask, flat_tuple, seed, rel_bias,
                        num_heads,
                        float(attention_dropout), float(output_dropout),
                        interpret, bool(causal))
