"""Fused masked self-attention Pallas kernels (forward AND backward).

Why: XLA's unfused attention materializes the [B, N, S, S] score tensor,
its softmax, and the dropout mask in HBM — on the shipped BERT4Rec shapes
that S^2 traffic dominates the train step (XLA cost analysis: 17.4 GB
accessed/step at B=256, S=200; the step is HBM-bound at ~5% MXU
utilization). For S <= 200 a whole (batch, head) attention problem fits in
VMEM, so both passes run as single-block fusions:

- forward: QK^T, pad-mask bias, fp32 softmax, in-kernel dropout
  (``pltpu.prng_random_bits``, seeded per (batch, head) cell) and PV —
  HBM sees only q, k, v in and O out;
- backward: flash-style recompute — P and the SAME dropout mask are
  regenerated from q, k, v and the seed, then dV/dP/dS/dQ/dK are formed
  entirely in VMEM. No residual S^2 tensor is ever stored.

Longer sequences or non-TPU platforms fall back to the identical-math XLA
reference. Layout: q, k, v are ``[B, N, S, D]``; ``mask`` is ``[B, S]``
(1 = real key); softmax/score accumulation is fp32 regardless of IO dtype.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
# beyond this, the single-block kernel would not fit VMEM; use XLA
MAX_FUSED_SEQ_LEN = 1024

# per-cell VMEM estimate: ~12 live [S, S] fp32 intermediates across the
# fwd/bwd softmax pipelines + the q/k/v/do/output head blocks. Calibrated
# against a measured Mosaic failure: 12 heads x S=512 x D=64 bf16
# estimated 17.3 MB here and failed at 18 MB actual (16 MB limit)
_VMEM_BUDGET = 14 * 1024 * 1024


def _heads_per_cell(n, s, d, itemsize):
    """Largest divisor of n whose (batch-element, head-group) cell fits
    VMEM — all heads for the shipped S<=200 shapes, fewer at
    reference-default scale (12 heads, S=512)."""
    for hpc in range(n, 0, -1):
        if n % hpc:
            continue
        if 12 * s * s * 4 + 8 * hpc * s * d * itemsize <= _VMEM_BUDGET:
            return hpc
    return 1


# --------------------------------------------------------------------------- #
# XLA reference (fallback + numerics oracle)
# --------------------------------------------------------------------------- #

def mha_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  mask: jnp.ndarray,
                  dropout_rate: float = 0.0,
                  dropout_rng=None,
                  causal: bool = False) -> jnp.ndarray:
    """Identical math in plain XLA. Dropout (if any) uses the jax PRNG —
    same distribution as the kernel, different stream."""
    d = q.shape[-1]
    scores = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d)
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF)
    if causal:
        s = q.shape[2]
        idx = jnp.arange(s)
        bias = bias + jnp.where(idx[None, :] <= idx[:, None],
                                0.0, NEG_INF)[None, None]
    probs = jax.nn.softmax(scores + bias, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bnqk,bnkd->bnqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# --------------------------------------------------------------------------- #
# kernels
# --------------------------------------------------------------------------- #

def _dropout_keep_scale(shape, rate):
    """Regenerate the in-kernel dropout multiplier: keep/(1-rate) or 0.

    Caller must have seeded the PRNG. Threshold compare on raw uint32 bits
    keeps everything integer until the final select.
    """
    bits = pltpu.prng_random_bits(shape)  # uint32
    threshold = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _probs(q, k, mask, scale, causal):
    """fp32 softmax(q k^T * scale + pad bias [+ causal bias]) for one
    (batch, head) cell. The causal mask is a rank-2 iota compare built in
    VMEM (Mosaic has no 1-D iota) — no dense bias ever touches HBM."""
    s_mat = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [S, S]
    s_mat = s_mat + jnp.where(mask > 0, 0.0, NEG_INF)[None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s_mat.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s_mat.shape, 1)
        s_mat = s_mat + jnp.where(col <= row, 0.0, NEG_INF)
    m = jnp.max(s_mat, axis=-1, keepdims=True)
    p = jnp.exp(s_mat - m)
    # reciprocal broadcast-multiply beats an [S, S] divide on the VPU
    return p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))


def _seed_cell(seed_ref, n_heads, hpc, head):
    """Unique PRNG stream per (batch, GLOBAL head) pair; the grid is
    (batch, head-group) so the stream assignment is identical for every
    heads-per-cell choice."""
    b = pl.program_id(0)
    head_global = pl.program_id(1) * hpc + head
    pltpu.prng_seed(seed_ref[0] + b * n_heads + head_global)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale, dropout_rate, n_heads, hpc, causal):
    mask = mask_ref[pl.program_id(0)]
    for h in range(hpc):  # static unroll; the cell's heads share the mask
        q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
        p = _probs(q, k, mask, scale, causal)
        if dropout_rate > 0.0:
            _seed_cell(seed_ref, n_heads, hpc, h)
            p = p * _dropout_keep_scale(p.shape, dropout_rate)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, dropout_rate, n_heads,
                hpc, causal):
    mask = mask_ref[pl.program_id(0)]
    for h in range(hpc):
        q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
        do = do_ref[0, h].astype(jnp.float32)

        p = _probs(q, k, mask, scale, causal)                 # [S, S] fp32
        if dropout_rate > 0.0:
            _seed_cell(seed_ref, n_heads, hpc, h)
            keep = _dropout_keep_scale(p.shape, dropout_rate)
            d_mat = p * keep
        else:
            keep = None
            d_mat = p

        # dV = D^T dO
        dv = jax.lax.dot_general(
            d_mat.astype(v.dtype), do.astype(v.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        # dD = dO V^T ; dP = dD * keep
        dd = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = dd * keep if keep is not None else dd
        # softmax jacobian: dS = P * (dP - rowsum(dP * P))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)
        # dQ = dS K * scale ; dK = dS^T Q * scale
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _cell_specs(b, n, s, d, hpc):
    # one grid cell = one batch element with a GROUP of hpc heads (all of
    # them when the working set fits VMEM — the per-head [S, D] matmuls
    # are tiny at S<=200, so batching heads amortizes per-cell overhead
    # and reuses the mask load; at reference-default scale the estimator
    # shrinks the group instead of falling off the kernel). Index maps
    # take (*grid_ids, *scalar_prefetch_refs); the mask is loaded whole
    # (TPU tiling forbids a (1, S) block) and indexed by program_id.
    qkv = pl.BlockSpec((1, hpc, s, d), lambda i, j, *_: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((b, s), lambda i, j, *_: (0, 0),
                        memory_space=pltpu.VMEM)
    return qkv, mask


def _forward(q, k, v, mask, seed, dropout_rate, interpret, causal):
    b, n, s, d = q.shape
    hpc = _heads_per_cell(n, s, d, q.dtype.itemsize)
    qkv_spec, mask_spec = _cell_specs(b, n, s, d, hpc)
    kernel = functools.partial(_fwd_kernel, scale=1.0 / math.sqrt(d),
                               dropout_rate=dropout_rate, n_heads=n,
                               hpc=hpc, causal=causal)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // hpc),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_specs=qkv_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * s * s * d,
            bytes_accessed=4 * b * n * s * d * q.dtype.itemsize,
            transcendentals=b * n * s * s),
        interpret=interpret,
    )(seed, q, k, v, mask)


def _backward(q, k, v, mask, seed, do, dropout_rate, interpret, causal):
    b, n, s, d = q.shape
    hpc = _heads_per_cell(n, s, d, q.dtype.itemsize)
    qkv_spec, mask_spec = _cell_specs(b, n, s, d, hpc)
    kernel = functools.partial(_bwd_kernel, scale=1.0 / math.sqrt(d),
                               dropout_rate=dropout_rate, n_heads=n,
                               hpc=hpc, causal=causal)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n // hpc),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec, qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, n, s, d), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=11 * b * n * s * s * d,
            bytes_accessed=8 * b * n * s * d * q.dtype.itemsize,
            transcendentals=b * n * s * s),
        interpret=interpret,
    )(seed, q, k, v, mask, do)


# --------------------------------------------------------------------------- #
# custom-vjp wrapper
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention(q, k, v, mask, seed, dropout_rate, interpret, causal):
    return _forward(q, k, v, mask, seed, dropout_rate, interpret, causal)


def _flash_fwd(q, k, v, mask, seed, dropout_rate, interpret, causal):
    out = _forward(q, k, v, mask, seed, dropout_rate, interpret, causal)
    return out, (q, k, v, mask, seed)


def _flash_bwd(dropout_rate, interpret, causal, residuals, g):
    q, k, v, mask, seed = residuals
    dq, dk, dv = _backward(q, k, v, mask, seed, g, dropout_rate, interpret,
                           causal)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), \
        None, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: jnp.ndarray,
                    dropout_rate: float = 0.0,
                    seed=None,
                    use_pallas: bool = True,
                    interpret: bool = None,
                    causal: bool = False) -> jnp.ndarray:
    """Masked MHA ``[B, N, S, D] -> [B, N, S, D]`` with optional fused
    attention-probability dropout.

    :param seed: int32 scalar/array seeding the in-kernel dropout PRNG
        (required when ``dropout_rate > 0``); same seed => same mask, and
        the backward pass regenerates it exactly.
    :param causal: left-to-right attention (SASRec family): query i sees
        keys j <= i only; the triangle mask is built in-kernel, no dense
        bias in HBM.
    """
    s = q.shape[2]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if not use_pallas or s > MAX_FUSED_SEQ_LEN or \
            (interpret and dropout_rate > 0.0):
        # interpret mode stubs pltpu.prng_random_bits with zeros (everything
        # would be dropped) -> XLA reference with a jax-PRNG mask instead
        rng = (jax.random.fold_in(jax.random.key(0), jnp.asarray(seed))
               if dropout_rate > 0.0 and seed is not None else None)
        return mha_reference(q, k, v, mask, dropout_rate, rng, causal=causal)
    if seed is None:
        seed = 0
    seed = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    return _flash_attention(q, k, v, mask, seed, float(dropout_rate),
                            interpret, bool(causal))
