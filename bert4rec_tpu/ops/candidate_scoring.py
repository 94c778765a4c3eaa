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


def gt_ranks_tiled(hidden: jnp.ndarray, table: jnp.ndarray,
                   output_bias: jnp.ndarray, gt_ids: jnp.ndarray, *,
                   vocab_size: int,
                   exclude: jnp.ndarray = None,
                   tile: int = 8192) -> jnp.ndarray:
    """Full-catalog 1-based GT ranks WITHOUT materializing ``[B, P, V]``.

    The dense rank path (``BERT4RecModel.gt_ranks_full_vocab``) holds the
    full fp32 logits tensor — 13.7 GB at the Reddit catalog's 335k items
    with B=256/P=40, which cannot exist on one chip. This streams the
    tied table through a ``lax.scan`` over vocab tiles: per tile one
    ``[rows, tile]`` MXU matmul, compare against the ground-truth logit,
    accumulate the beaten-count. Peak extra memory is one logits tile
    (``B*P*tile`` fp32) + an optional ``[B, V]`` bool exclusion mask.

    Identical rank law to the dense path (ties count AHEAD of the ground
    truth; the GT column never self-counts; vocab-padding rows and
    excluded ids never compete): rank = 1 + #{v: valid(v), v != gt,
    logit_v >= logit_gt}.

    :param hidden: ``[B, P, W]`` transformed masked-position states
    :param table: ``[Vp, W]`` tied table (Vp = padded vocab)
    :param output_bias: ``[Vp]``
    :param gt_ids: ``[B, P]`` int ground-truth ids
    :param vocab_size: true vocab width (ids >= this are padding rows)
    :param exclude: optional ``[B, E]`` int ids (< 0 = padding) removed
        from the competitor set per batch row
    :param tile: vocab tile width (the scan length is ceil(Vp / tile)).
        Measured on v5e at Reddit width (B=256, P=40, V=335k):
        4096/8192/16384/32768 -> 20.5/19.8/20.6/21.9 ms — the default is
        at the optimum, and the flat curve says the cost is the [rows,
        tile] compare/mask VPU passes (the same VPU-bound law as the
        tiled loss, CLAUDE.md), not scan overhead or table bandwidth
        (171 MB at 819 GB/s would be 0.2 ms). A bias-folded variant
        (masks pre-merged into one [B, Vp] fp32 additive bias, per-tile
        body = matmul + add + compare + reduce) was implemented, proven
        rank-identical, and measured SLOWER interleaved in one process
        (21.2 -> 26.1 ms): XLA already fuses these boolean masks into
        the compare, and the transposed bias layout + in-scan
        self-hit gather cost more than the ops they removed — do not
        re-try pass-count reasoning here, measure
    :returns: ``[B, P]`` int32 ranks (>= 1)
    """
    vp, w = table.shape
    b, p = gt_ids.shape
    n_tiles = -(-vp // tile)
    pad = n_tiles * tile - vp
    dtype = hidden.dtype
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
        output_bias = jnp.pad(output_bias, (0, pad))
    gt_ids = gt_ids.astype(jnp.int32)

    # ground-truth logit from a gather + row-dot (fp32 accumulation, the
    # same contraction axis/precision as the tile matmul)
    gt_rows = jnp.take(table, gt_ids, axis=0)              # [B, P, W]
    gt_logit = jnp.einsum("bpw,bpw->bp", hidden,
                          gt_rows.astype(dtype),
                          preferred_element_type=jnp.float32)
    gt_logit = gt_logit + jnp.take(output_bias, gt_ids, axis=0)

    excl_mask = None
    if exclude is not None:
        # dense [B, Vp] bool, sliced per tile inside the scan (bool bytes:
        # ~86 MB at 335k x B=256 — cheap next to one logits tile)
        exclude = exclude.astype(jnp.int32)
        idx = jnp.where(exclude >= 0, exclude, n_tiles * tile)
        excl_mask = jnp.zeros((b, n_tiles * tile + 1), jnp.bool_)
        excl_mask = excl_mask.at[
            jnp.arange(b)[:, None], idx].set(True)[:, :-1]

    table_tiles = table.reshape(n_tiles, tile, w)
    bias_tiles = output_bias.reshape(n_tiles, tile)

    def body(count, t):
        tbl_t, bias_t, t_idx = t
        logits_t = jnp.einsum("bpw,tw->bpt", hidden,
                              tbl_t.astype(dtype),
                              preferred_element_type=jnp.float32)
        logits_t = logits_t + bias_t
        ids_t = t_idx * tile + jnp.arange(tile, dtype=jnp.int32)
        valid = (ids_t[None, None, :] < vocab_size) \
            & (ids_t[None, None, :] != gt_ids[..., None])
        if excl_mask is not None:
            sl = jax.lax.dynamic_slice_in_dim(excl_mask, t_idx * tile,
                                              tile, axis=1)
            valid = valid & ~sl[:, None, :]
        beaten = valid & (logits_t >= gt_logit[..., None])
        return count + jnp.sum(beaten.astype(jnp.int32), axis=-1), None

    count0 = jnp.zeros((b, p), jnp.int32)
    count, _ = jax.lax.scan(
        body, count0,
        (table_tiles, bias_tiles, jnp.arange(n_tiles, dtype=jnp.int32)))
    return count + 1


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
