"""Cross-shard top-k over the vocab axis of MLM logits.

The full-vocab ranking path of the reference (``rank_items`` with no
candidate list, reference bert4rec/models/bert4rec_model.py:203-240) sorts
the entire ``[B, P, V]`` logits tensor. On a vocab-sharded table (SURVEY.md
§7 hard part 3) an ``argsort``/``softmax`` over the sharded vocab axis makes
GSPMD all-gather the logits — replicating a 335k-wide tensor per masked
position at Reddit scale.

This op keeps the reduction shard-local: the vocab axis is reshaped to an
explicit ``[shards, V/shards]`` pair of dims (a layout-preserving reshape
when the shard count matches the mesh's 'model' axis), each shard computes a
local ``lax.top_k``, and only the ``shards * k`` surviving (value, index)
pairs are gathered and merged with a second tiny ``top_k``. Correctness:
every global top-k element is, within its own shard, among that shard's
local top-k, so the merge pool always contains the exact answer.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bert4rec_tpu.core.mesh import MODEL_AXIS


def topk_over_vocab(logits: jnp.ndarray, k: int, *,
                    vocab_shards: int = 1,
                    mesh: Optional[Mesh] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k values and indices over the last (vocab) axis.

    :param logits: ``[..., V]``; the vocab axis may be GSPMD-sharded
    :param vocab_shards: how many contiguous blocks to split V into for the
        local pass; pass the mesh's 'model'-axis size (or use ``mesh``) so
        the blocks line up with the actual shards. Any divisor of V is
        *correct*; only the collective traffic changes.
    :param mesh: optional mesh — derives ``vocab_shards`` from its 'model'
        axis and pins the block dim to it with a sharding constraint.
    :returns: ``(values [..., k], indices [..., k])`` ordered best-first
    """
    v = logits.shape[-1]
    n = vocab_shards
    if mesh is not None and MODEL_AXIS in mesh.axis_names:
        n = max(n, mesh.shape[MODEL_AXIS])
    if n <= 1 or v % n != 0:
        return jax.lax.top_k(logits, min(k, v))

    lead = logits.shape[:-1]
    block = v // n
    k_local = min(k, block)
    blocks = logits.reshape(*lead, n, block)
    if mesh is not None and MODEL_AXIS in mesh.axis_names:
        # pin only the block dim to 'model'; leading (batch) dims stay
        # UNCONSTRAINED so a data-sharded batch is not forced to replicate
        spec = P(*([P.UNCONSTRAINED] * len(lead)), MODEL_AXIS, None)
        blocks = jax.lax.with_sharding_constraint(
            blocks, NamedSharding(mesh, spec))

    vals, idx = jax.lax.top_k(blocks, k_local)            # [..., n, k_local]
    offsets = (jnp.arange(n, dtype=idx.dtype) * block)[:, None]
    idx = idx + offsets                                   # global vocab ids

    vals = vals.reshape(*lead, n * k_local)
    idx = idx.reshape(*lead, n * k_local)
    top_vals, pos = jax.lax.top_k(vals, min(k, n * k_local))
    return top_vals, jnp.take_along_axis(idx, pos, axis=-1)


def exclusion_bias(batch_excludes: jnp.ndarray, vocab_size: int,
                   neg: float = -1e9) -> jnp.ndarray:
    """Additive ``[B, V]`` bias that knocks out per-row excluded ids.

    :param batch_excludes: ``[B, E]`` int ids, entries < 0 are padding
    :returns: fp32 bias, ``neg`` at excluded ids, 0 elsewhere
    """
    b = batch_excludes.shape[0]
    rows = jnp.arange(b)[:, None]
    # out-of-range ids (incl. the < 0 pads remapped to V) are dropped
    safe = jnp.where(batch_excludes >= 0, batch_excludes, vocab_size)
    bias = jnp.zeros((b, vocab_size), jnp.float32)
    return bias.at[rows, safe].set(neg, mode="drop")
