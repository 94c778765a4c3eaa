"""Primitive NN layers as (init, apply) function pairs over dict pytrees.

These natively rebuild the ``tfm.nlp.layers`` components the reference leans
on (SURVEY.md §2.8): ``OnDeviceEmbedding``, ``PositionEmbedding`` and the
dense/LN/dropout plumbing inside ``TransformerEncoderBlock``. Params are plain
nested dicts so sharding stays a pure path->PartitionSpec mapping
(bert4rec_tpu/core/partitioning.py) and the model code carries no framework
state.

Dtype policy: params live in ``param_dtype`` (fp32); matmuls run in
``compute_dtype`` (bf16 on TPU to hit the MXU); layer norm and softmax
accumulate in fp32.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def truncated_normal_init(rng, shape, stddev: float, dtype=jnp.float32):
    """TF-style TruncatedNormal: resampled beyond 2 sigma, no variance
    correction (matches keras.initializers.TruncatedNormal used at reference
    bert4rec_encoder.py:76-79)."""
    return jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32) \
        .astype(dtype) * stddev


# --------------------------------------------------------------------------- #
# dense
# --------------------------------------------------------------------------- #

def init_dense(rng, in_dim: int, out_dim: int, stddev: float) -> dict:
    return {
        "kernel": truncated_normal_init(rng, (in_dim, out_dim), stddev),
        "bias": jnp.zeros((out_dim,), jnp.float32),
    }


def dense(params: dict, x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    kernel = params["kernel"].astype(compute_dtype)
    y = jnp.dot(x.astype(compute_dtype), kernel,
                preferred_element_type=compute_dtype)
    return y + params["bias"].astype(compute_dtype)


# --------------------------------------------------------------------------- #
# layer norm — fp32 accumulation (reference uses fp32 LN, bert4rec_encoder.py:116-120)
# --------------------------------------------------------------------------- #

LN_EPSILON = 1e-12  # reference LayerNorm epsilon (bert4rec_encoder.py:117)


def init_layer_norm(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params: dict, x: jnp.ndarray,
               epsilon: float = LN_EPSILON) -> jnp.ndarray:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * params["scale"] + params["bias"]
    return y.astype(orig_dtype)


# --------------------------------------------------------------------------- #
# dropout
# --------------------------------------------------------------------------- #

def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float,
            training: bool) -> jnp.ndarray:
    """Inverted dropout; identity when not training or rate == 0."""
    if not training or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# --------------------------------------------------------------------------- #
# embeddings
# --------------------------------------------------------------------------- #

def init_embedding(rng, vocab_size: int, width: int, stddev: float) -> dict:
    """The item-embedding table (tfm OnDeviceEmbedding equivalent,
    reference bert4rec_encoder.py:103-107). Row dim = vocab => row-sharded
    over the 'model' mesh axis by partitioning rules."""
    return {"embedding": truncated_normal_init(rng, (vocab_size, width), stddev)}


def embedding_lookup(params: dict, ids: jnp.ndarray,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """Gather rows; one-hot matmul is left to XLA/GSPMD to choose when the
    table is sharded (it rewrites gathers over sharded operands).

    Handles both dense (``embedding``) and int8 weights-only quantized
    tables (``embedding_q`` + ``embedding_scale``; models/quantization.py)
    — quantized rows are dequantized after the gather, so only the touched
    rows pay the multiply."""
    if "embedding_q" in params:
        rows = jnp.take(params["embedding_q"], ids, axis=0) \
            .astype(compute_dtype)
        scale = jnp.take(params["embedding_scale"], ids, axis=0) \
            .astype(compute_dtype)
        return rows * scale[..., None]
    return jnp.take(params["embedding"], ids, axis=0).astype(compute_dtype)


def quantize_embedding(params: dict) -> dict:
    """Weights-only int8 quantization of an embedding table, symmetric
    per-row (per-item) scales: ``q = round(row / s)``, ``s = max|row|/127``.

    Row granularity keeps the tied-softmax math exact to apply *after* the
    logits matmul (``(h @ q^T) * s`` == ``h @ (q * s)^T``), so the serving
    paths never materialize a dequantized table."""
    table = params["embedding"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(table), axis=1) / 127.0
    scale = jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
    q = jnp.clip(jnp.round(table / scale[:, None]), -127, 127) \
        .astype(jnp.int8)
    return {"embedding_q": q, "embedding_scale": scale}


def dequantize_embedding(params: dict, dtype=jnp.float32) -> jnp.ndarray:
    """Dense ``[V, W]`` table from a quantized one (the correctness
    fallback for paths without a quantized fast path)."""
    return (params["embedding_q"].astype(dtype)
            * params["embedding_scale"][:, None].astype(dtype))


def init_position_embedding(rng, max_length: int, width: int,
                            stddev: float) -> dict:
    """Learned absolute positions (tfm PositionEmbedding equivalent,
    reference bert4rec_encoder.py:111-114)."""
    return {"embedding": truncated_normal_init(rng, (max_length, width), stddev)}


def position_embedding(params: dict, seq_len: int,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    return params["embedding"][:seq_len].astype(compute_dtype)


# --------------------------------------------------------------------------- #
# activations
# --------------------------------------------------------------------------- #

_ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_approx": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
}


def get_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"Unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}")


# --------------------------------------------------------------------------- #
# attention mask
# --------------------------------------------------------------------------- #

def self_attention_mask(input_mask: jnp.ndarray) -> jnp.ndarray:
    """2-D pad mask [B, S] -> additive 4-D attention bias [B, 1, 1, S]
    (tfm SelfAttentionMask equivalent, reference bert4rec_encoder.py:134-135,
    216 — built additively here so it folds into the attention logits)."""
    neg = jnp.asarray(-1e9, jnp.float32)
    return jnp.where(input_mask[:, None, None, :] > 0, 0.0, neg)
