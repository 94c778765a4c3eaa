"""Post-training int8 quantization for serving (BEYOND PARITY).

The item-embedding table is the model: at catalog scale it dwarfs the
transformer (Reddit, 335k items x 128 = 171 MB fp32 vs ~1.5 MB of encoder
weights — reference golden vocab sizes,
/root/reference/tests/datalaoders_tests/bert4rec_dataloaders_tests.py:222-250).
Weights-only symmetric per-item int8 (``layers.quantize_embedding``) cuts
its bytes — and the serving artifact, and the full-vocab logits matmul's
HBM table traffic — by 4x vs fp32.

The tied-softmax math stays exact relative to the quantized table because
the scales are per item (per table *row*): ``h @ (q * s)^T == (h @ q^T) * s``,
so the hot paths (``mlm_logits`` top-k, ``score_candidates``) matmul/gather
raw int8 codes and apply scales afterwards — a dense dequantized table is
never built there. Input-side lookups dequantize only the gathered rows.

Serving-only: quantized params are for inference (export, apps, eval);
training needs the float table.
"""

import jax.numpy as jnp

from bert4rec_tpu.models.components import layers as L


def quantize_params(params: dict) -> dict:
    """A new params pytree with the item-embedding table replaced by its
    int8 weights-only form (``embedding_q`` int8 [V, W] +
    ``embedding_scale`` fp32 [V]). Every other leaf is shared, not copied.

    All model paths accept the result — hot serving paths run quantized
    fast paths, everything else dequantizes transparently
    (``Bert4RecEncoder.get_embedding_table``)."""
    if is_quantized(params):
        return params
    encoder = dict(params["encoder"])
    encoder["item_embeddings"] = L.quantize_embedding(
        params["encoder"]["item_embeddings"])
    return {**params, "encoder": encoder}


def dequantize_params(params: dict) -> dict:
    """Invert :func:`quantize_params`' structure (values keep the
    quantization rounding error, bounded by scale/2 per weight)."""
    if not is_quantized(params):
        return params
    encoder = dict(params["encoder"])
    encoder["item_embeddings"] = {
        "embedding": L.dequantize_embedding(encoder["item_embeddings"])}
    return {**params, "encoder": encoder}


def is_quantized(params: dict) -> bool:
    return "embedding_q" in params.get("encoder", {}).get(
        "item_embeddings", {})


def table_bytes(params: dict) -> int:
    """Bytes of the (possibly quantized) item-embedding table — the
    quantization win, measurable."""
    emb = params["encoder"]["item_embeddings"]
    leaves = emb.values()
    return sum(jnp.asarray(v).nbytes for v in leaves)
