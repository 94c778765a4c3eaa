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
