"""Device-side weighted negative sampling (Gumbel top-k, no replacement).

The reference's evaluator draws its 100 popularity-weighted negatives per
masked position in pure python (reference
bert4rec/evaluation/bert4rec_evaluator.py:90-104 via
samplers/popular_random_sampler.py:77-117) — the measured hot spot of its
eval loop (SURVEY.md §3.3). Round 1 vectorized it on the host
(PopularRandomSampler.sample_batch); at ML-20M vocab the host pass still
costs ~10x a train step, so this op moves the same math into the jitted
eval computation: the popularity log-probabilities ride along as a device
constant, exclusions scatter ``-inf`` (one scatter per batch), and one
``lax.top_k`` per position draws the sample.

Gumbel top-k is *exact* weighted sampling without replacement: adding iid
Gumbel noise to log-probabilities and keeping the k largest is distributed
identically to sequential draws without replacement from the softmax of
those log-probabilities — so this path and the host sampler are the same
distribution, differing only in PRNG streams.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_negatives(key: jax.Array,
                     logp: jnp.ndarray,
                     without_idx: jnp.ndarray,
                     k: int,
                     neg: float = -1e30) -> jnp.ndarray:
    """Draw ``k`` weighted negatives per row, excluding per-row index sets.

    :param key: PRNG key
    :param logp: ``[V]`` fp32 log-probabilities (``-inf`` for zero-mass
        items — they are never drawn)
    :param without_idx: ``[..., W]`` int32 indices into ``logp`` to exclude;
        entries outside ``[0, V)`` (e.g. ``V`` as padding) are ignored
    :param k: sample size per row
    :returns: ``[..., k]`` int32 indices into ``logp``
    """
    v = logp.shape[0]
    lead = without_idx.shape[:-1]
    rows = 1
    for d in lead:
        rows *= int(d)

    u = jax.random.uniform(key, (rows, v), dtype=jnp.float32,
                           minval=1e-12, maxval=1.0)
    gumbel = -jnp.log(-jnp.log(u))
    # -inf log-probs poison the gumbel sum into NaN; clamp to a finite
    # floor that still never wins a top-k
    scores = gumbel + jnp.maximum(logp, neg)

    flat_without = without_idx.reshape(rows, -1)
    r = jnp.arange(rows)[:, None]
    scores = scores.at[r, flat_without].set(neg, mode="drop")

    _, idx = jax.lax.top_k(scores, k)
    return idx.reshape(*lead, k).astype(jnp.int32)


def popularity_logp(probs) -> jnp.ndarray:
    """Host probabilities -> fp32 device log-probabilities."""
    import numpy as np
    p = np.asarray(probs, dtype=np.float32)
    with np.errstate(divide="ignore"):
        return jnp.asarray(np.log(p))


def ranks_with_device_negatives(model, params, batch: dict, *,
                                logp: jnp.ndarray,
                                vocab_ids: jnp.ndarray,
                                without_idx: jnp.ndarray,
                                key: jax.Array,
                                sample_size: int,
                                mesh=None) -> jnp.ndarray:
    """Fused eval computation: sample negatives -> candidate-only scoring ->
    1-based ground-truth ranks ``[B, P]`` (jit this whole function).

    :param vocab_ids: ``[V]`` item id of each sampler-vocab index
    :param without_idx: ``[B, P, W]`` sampler-vocab indices to exclude
    """
    neg_idx = sample_negatives(key, logp, without_idx, sample_size)
    negatives = jnp.take(vocab_ids, neg_idx)              # [B, P, k] item ids
    gt = batch["masked_lm_ids"][..., None]
    candidates = jnp.concatenate(
        [negatives, gt.astype(negatives.dtype)], axis=-1)
    # duck-typed models may implement score_candidates without a mesh
    # parameter (the host path signature-guards the same way)
    import inspect
    sc_kwargs = {}
    if mesh is not None and "mesh" in inspect.signature(
            model.score_candidates).parameters:
        sc_kwargs["mesh"] = mesh
    cand = model.score_candidates(params, batch, candidates, **sc_kwargs)
    gt_logit = cand[..., -1:]
    beaten = jnp.sum((cand[..., :-1] >= gt_logit).astype(jnp.int32), axis=-1)
    # invalid positions -> rank 0 (see evaluator: hosts filter > 0 on the
    # replicated output, which is the global batch in multi-host runs)
    return jnp.where(batch["masked_lm_weights"] > 0, beaten + 1, 0)
