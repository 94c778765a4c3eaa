"""Transformer encoder block (native rebuild of tfm TransformerEncoderBlock,
used at reference bert4rec_encoder.py:137-147).

Post-LN by default (tfm ``norm_first=False``):

    y = LN(x + dropout(MHA(x)))
    out = LN(y + dropout(FFN(y)))

Attention uses one fused QKV projection einsum so the MXU sees a single
[B*S, H] x [H, 3*H] matmul instead of three; scores/softmax accumulate fp32.
``query_range`` implements the reference's last-layer ``output_range`` slicing
(bert4rec_encoder.py:218-222): queries (and the residual stream) are cut to
the first ``query_range`` positions while keys/values span the full sequence.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from bert4rec_tpu.models.components import layers as L


def init_transformer_block(rng, hidden_size: int, num_heads: int,
                           inner_dim: int, stddev: float) -> dict:
    head_dim = hidden_size // num_heads
    keys = jax.random.split(rng, 4)
    return {
        "attention": {
            "qkv": {
                "kernel": L.truncated_normal_init(
                    keys[0], (hidden_size, 3, num_heads, head_dim), stddev),
                "bias": jnp.zeros((3, num_heads, head_dim), jnp.float32),
            },
            "output": {
                "kernel": L.truncated_normal_init(
                    keys[1], (num_heads, head_dim, hidden_size), stddev),
                "bias": jnp.zeros((hidden_size,), jnp.float32),
            },
        },
        "attention_norm": L.init_layer_norm(hidden_size),
        "intermediate": L.init_dense(keys[2], hidden_size, inner_dim, stddev),
        "output": L.init_dense(keys[3], inner_dim, hidden_size, stddev),
        "output_norm": L.init_layer_norm(hidden_size),
    }


def _attention(params: dict, x: jnp.ndarray, attn_bias: jnp.ndarray,
               num_heads: int, *, rng, attention_dropout: float,
               training: bool, compute_dtype,
               query_range: Optional[int] = None,
               use_flash: bool = False,
               input_mask: Optional[jnp.ndarray] = None,
               causal: bool = False) -> jnp.ndarray:
    """Multi-head self-attention with additive mask bias [B,1,1,S].

    With ``use_flash`` (and no attention dropout active, no query slicing),
    dispatches to the fused Pallas kernel (ops/flash_attention.py).

    ``causal`` only affects the flash path (the kernel builds the triangle
    in VMEM); on the XLA path the caller folds the causal bias into
    ``attn_bias`` instead.
    """
    head_dim = params["qkv"]["kernel"].shape[-1]
    qkv_kernel = params["qkv"]["kernel"].astype(compute_dtype)
    qkv_bias = params["qkv"]["bias"].astype(compute_dtype)

    x_q = x if query_range is None else x[:, :query_range]
    # fused projection: keys/values from the full sequence
    kv = jnp.einsum("bsh,htnd->tbsnd", x, qkv_kernel,
                    preferred_element_type=compute_dtype) + qkv_bias[:, None, None]
    if query_range is None:
        q = kv[0]
    else:
        q = jnp.einsum("bsh,hnd->bsnd", x_q, qkv_kernel[:, 0],
                       preferred_element_type=compute_dtype) \
            + qkv_bias[0][None, None]
    k, v = kv[1], kv[2]

    flash_ok = use_flash and query_range is None and input_mask is not None
    if flash_ok:
        from bert4rec_tpu.ops.flash_attention import (
            flash_attention as fused_attention,
        )
        rate = attention_dropout if training else 0.0
        seed = None
        if rate > 0.0:
            if rng is None:
                rate = 0.0
            else:
                seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1)
        context = fused_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), input_mask,
            dropout_rate=rate, seed=seed,
            causal=causal).transpose(0, 2, 1, 3)
        out = jnp.einsum("bqnd,ndh->bqh", context.astype(compute_dtype),
                         params["output"]["kernel"].astype(compute_dtype),
                         preferred_element_type=compute_dtype)
        return out + params["output"]["bias"].astype(compute_dtype)

    scale = 1.0 / math.sqrt(head_dim)
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if query_range is not None and attn_bias.ndim >= 3 \
            and attn_bias.shape[-2] not in (1, scores.shape[-2]):
        # dense [B, n, S, S] bias (e.g. temporal attention): cut the query
        # rows to match the sliced scores
        attn_bias = attn_bias[..., :query_range, :]
    scores = scores + attn_bias  # [B,1,1,S] broadcasts over heads & queries
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = L.dropout(rng, probs, attention_dropout, training)
    probs = probs.astype(compute_dtype)

    context = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=compute_dtype)
    out = jnp.einsum("bqnd,ndh->bqh", context,
                     params["output"]["kernel"].astype(compute_dtype),
                     preferred_element_type=compute_dtype)
    return out + params["output"]["bias"].astype(compute_dtype)


def transformer_block(params: dict, x: jnp.ndarray, attn_bias: jnp.ndarray,
                      *, num_heads: int, inner_activation,
                      output_dropout: float = 0.1,
                      attention_dropout: float = 0.1,
                      rng: Optional[jax.Array] = None,
                      training: bool = False,
                      norm_first: bool = False,
                      compute_dtype=jnp.float32,
                      query_range: Optional[int] = None,
                      use_flash: bool = False,
                      input_mask: Optional[jnp.ndarray] = None,
                      causal: bool = False) -> jnp.ndarray:
    rngs = (jax.random.split(rng, 3) if rng is not None else (None,) * 3)

    residual = x if query_range is None else x[:, :query_range]
    attn_in = L.layer_norm(params["attention_norm"], x) if norm_first else x
    attn_out = _attention(
        params["attention"], attn_in, attn_bias, num_heads,
        rng=rngs[0], attention_dropout=attention_dropout, training=training,
        compute_dtype=compute_dtype, query_range=query_range,
        use_flash=use_flash, input_mask=input_mask, causal=causal)
    attn_out = L.dropout(rngs[1], attn_out, output_dropout, training)
    if norm_first:
        y = residual + attn_out
        ffn_in = L.layer_norm(params["output_norm"], y)
    else:
        y = L.layer_norm(params["attention_norm"], residual + attn_out)
        ffn_in = y

    h = L.dense(params["intermediate"], ffn_in, compute_dtype)
    h = inner_activation(h)
    h = L.dense(params["output"], h, compute_dtype)
    h = L.dropout(rngs[2], h, output_dropout, training)
    if norm_first:
        return y + h
    return L.layer_norm(params["output_norm"], y + h)
