"""Candidate scoring for sampled-negative evaluation.

The reference's eval path computes full-vocab MLM logits ``[B, P, V]`` and
then gathers ~101 candidates per position on the host (reference
bert4rec_model.py:203-240). For a Reddit-sized vocab (335k items) that
materializes hundreds of MB per batch just to read out 101 numbers per
position.

``score_candidates`` computes ONLY the candidate logits: gather the C
candidate rows of the (possibly vocab-sharded) tied embedding table and
contract against the transformed hidden states —
``O(B*P*C*W)`` instead of ``O(B*P*V*W)`` FLOPs and memory. With the table
sharded over the 'model' mesh axis, XLA lowers the gather to an all-gather
of just the candidate rows (C << V), so the eval path also avoids the
full-vocab collective.
"""

import jax
import jax.numpy as jnp


def score_candidates_reference(hidden: jnp.ndarray, table: jnp.ndarray,
                               output_bias: jnp.ndarray,
                               candidates: jnp.ndarray) -> jnp.ndarray:
    """Full-vocab matmul then gather (the reference semantics)."""
    logits = jnp.einsum("bpw,vw->bpv", hidden, table,
                        preferred_element_type=jnp.float32) + output_bias
    return jnp.take_along_axis(logits, candidates, axis=-1)


def score_candidates(hidden: jnp.ndarray, table: jnp.ndarray,
                     output_bias: jnp.ndarray,
                     candidates: jnp.ndarray) -> jnp.ndarray:
    """Candidate-only logits ``[B, P, C]``.

    :param hidden: ``[B, P, W]`` transformed masked-position states
    :param table: ``[V, W]`` tied embedding table
    :param output_bias: ``[V]``
    :param candidates: ``[B, P, C]`` int candidate ids
    """
    cand_emb = jnp.take(table, candidates, axis=0)        # [B, P, C, W]
    cand_bias = jnp.take(output_bias, candidates, axis=0)  # [B, P, C]
    logits = jnp.einsum("bpw,bpcw->bpc", hidden,
                        cand_emb.astype(hidden.dtype),
                        preferred_element_type=jnp.float32)
    return logits + cand_bias


def score_candidates_quantized(hidden: jnp.ndarray, emb_params: dict,
                               output_bias: jnp.ndarray,
                               candidates: jnp.ndarray) -> jnp.ndarray:
    """Candidate-only logits from an int8 weights-only quantized table
    (``embedding_q`` [V, W] int8 + ``embedding_scale`` [V];
    models/quantization.py).

    Gathers raw int8 rows (4x less table traffic than fp32) and applies
    each candidate's scale AFTER the contraction — identical math to
    :func:`score_candidates` on the dequantized table."""
    q_rows = jnp.take(emb_params["embedding_q"], candidates, axis=0)
    s_rows = jnp.take(emb_params["embedding_scale"], candidates, axis=0)
    cand_bias = jnp.take(output_bias, candidates, axis=0)     # [B, P, C]
    logits = jnp.einsum("bpw,bpcw->bpc", hidden,
                        q_rows.astype(hidden.dtype),
                        preferred_element_type=jnp.float32)
    return logits * s_rows + cand_bias


def score_candidates_sharded(hidden: jnp.ndarray, table: jnp.ndarray,
                             output_bias: jnp.ndarray,
                             candidates: jnp.ndarray,
                             mesh) -> jnp.ndarray:
    """Candidate-only logits over a 'model'-axis row-sharded table.

    GSPMD lowers ``jnp.take(sharded_table, replicated_candidates)`` by
    all-gathering the table operand — at Reddit scale that replicates the
    full ``[335k, W]`` table per eval batch just to read ~101 rows per
    position. This shard_map keeps the gather shard-local: each shard pulls
    only the candidate rows it owns (others contribute zero) and the partial
    ``[B, P, C]`` logits — the only cross-shard traffic — are one tiny
    ``psum`` over the 'model' axis. Same math as :func:`score_candidates`.

    :param hidden: ``[B, P, W]``; batch dim sharded over 'data' if present
    :param table: ``[V, W]`` with V divisible by the 'model' axis size
    :param candidates: ``[B, P, C]`` int candidate ids (valid vocab rows)
    """
    from jax.sharding import PartitionSpec as P

    from bert4rec_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

    mp = dict(mesh.shape).get(MODEL_AXIS, 1)
    v = table.shape[0]
    if mp <= 1 or v % mp != 0:
        return score_candidates(hidden, table, output_bias, candidates)
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    v_local = v // mp

    def local(hidden_l, table_l, bias_l, cand_l):
        offset = jax.lax.axis_index(MODEL_AXIS).astype(jnp.int32) * v_local
        local_ids = cand_l.astype(jnp.int32) - offset
        owned = (local_ids >= 0) & (local_ids < v_local)
        safe = jnp.where(owned, local_ids, 0)
        cand_emb = jnp.take(table_l, safe, axis=0)          # [B, P, C, W]
        cand_bias = jnp.take(bias_l, safe, axis=0)          # [B, P, C]
        logits = jnp.einsum("bpw,bpcw->bpc", hidden_l,
                            cand_emb.astype(hidden_l.dtype),
                            preferred_element_type=jnp.float32)
        partial = jnp.where(owned, logits + cand_bias, 0.0)
        return jax.lax.psum(partial, MODEL_AXIS)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data, None, None), P(MODEL_AXIS, None), P(MODEL_AXIS),
                  P(data, None, None)),
        out_specs=P(data, None, None))
    return fn(hidden, table, output_bias, candidates)
