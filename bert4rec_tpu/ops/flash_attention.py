"""Fused masked self-attention Pallas kernel.

For the shipped BERT4Rec shapes (S <= 200, D <= 64) a whole (batch, head)
attention problem fits in VMEM, so the kernel is a single-block fusion:
QK^T, pad-mask bias, softmax and PV never touch HBM — one HBM read per
operand, one write of the output. That is the speed-of-light data movement
for this op; XLA's unfused path materializes the [B,N,S,S] score tensor.

Longer sequences (or platforms without Mosaic) fall back to the identical
XLA reference implementation. The backward pass reuses the XLA reference via
``jax.custom_vjp`` — the kernel accelerates forward/eval/serving, training
gradients recompute with XLA (which fuses well on the backward too).

Layout: q, k, v are ``[B, N, S, D]``; ``mask`` is ``[B, S]`` (1 = real
token). Scores/softmax accumulate fp32 regardless of input dtype.
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


def mha_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """XLA reference: identical math, used as fallback and backward."""
    d = q.shape[-1]
    scores = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d)
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF)
    probs = jax.nn.softmax(scores + bias, axis=-1)
    return jnp.einsum("bnqk,bnkd->bnqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0, 0]          # [S, D]
    k = k_ref[0, 0]          # [S, D]
    v = v_ref[0, 0]          # [S, D]
    mask = mask_ref[0]       # [S]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [S, S]
    scores = scores + jnp.where(mask > 0, 0.0, NEG_INF)[None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / denom
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _flash_attention_forward(q, k, v, mask, interpret=False):
    b, n, s, d = q.shape
    kernel = functools.partial(_attention_kernel, scale=1.0 / math.sqrt(d))
    return pl.pallas_call(
        kernel,
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * s * s * d,
            bytes_accessed=(3 * b * n * s * d + b * n * s * d) * q.dtype.itemsize,
            transcendentals=b * n * s * s),
        interpret=interpret,
    )(q, k, v, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, mask, interpret=False):
    return _flash_attention_forward(q, k, v, mask, interpret)


def _fwd(q, k, v, mask, interpret=False):
    return _flash_attention_forward(q, k, v, mask, interpret), (q, k, v, mask)


def _bwd(interpret, residuals, g):
    q, k, v, mask = residuals
    _, vjp = jax.vjp(lambda q, k, v: mha_reference(q, k, v, mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: jnp.ndarray,
                    use_pallas: bool = True,
                    interpret: bool = None) -> jnp.ndarray:
    """Masked MHA ``[B, N, S, D] -> [B, N, S, D]``.

    Dispatches to the fused Pallas kernel on TPU (XLA reference otherwise,
    or when the sequence is too long for the single-block kernel).
    """
    s = q.shape[2]
    if not use_pallas or s > MAX_FUSED_SEQ_LEN:
        return mha_reference(q, k, v, mask)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _flash_attention(q, k, v, mask, interpret)
