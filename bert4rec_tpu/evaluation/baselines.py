"""Non-learned baselines scored through the EXACT evaluation protocol
(BEYOND PARITY — the reference reports model metrics with no floor to
compare against).

A sampled-negative HR@10 means little in isolation: the popularity floor
on a 101-candidate protocol with a popularity-biased sampler is
substantial. :class:`PopularityScorer` duck-types the model interface the
evaluator consumes (``score_candidates`` + ``gt_ranks_full_vocab``), so
one evaluator run yields the baseline under identical candidates,
exclusions, and tie semantics:

    base = PopularityScorer.from_source(source, vocab_size=V)
    floor = BERT4RecEvaluator(sampler=...).evaluate(base, None, test_ds)

``tools/quality_run.py`` reports this floor next to the model's metrics.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9

__all__ = ["PopularityScorer"]


class PopularityScorer:
    """Scores every item by its global interaction count.

    Protocol-compatible stand-in for a trained model: candidate scoring
    and full-catalog ranking use the popularity count as the "logit", with
    the same ties-ahead-of-ground-truth law as
    :meth:`BERT4RecModel.gt_ranks_full_vocab`. Stateless w.r.t. ``params``
    (the evaluator passes them through; they are ignored).

    :param counts: ``[vocab_size]`` interaction count per tokenized id.
    :param special_token_ids: ids that must never outrank anything
        (PAD/MASK/UNK; scored ``-inf``).
    """

    def __init__(self, counts: np.ndarray,
                 special_token_ids: Sequence[int] = (0, 1, 2)):
        scores = np.asarray(counts, np.float32).copy()
        for sid in special_token_ids:
            if 0 <= sid < scores.shape[0]:
                scores[sid] = NEG_INF
        self._scores = jnp.asarray(scores)

    @classmethod
    def from_source(cls, source: Sequence[int], vocab_size: int,
                    **kwargs) -> "PopularityScorer":
        """Build from a token-id interaction list (duplicates = counts) —
        the same ``source`` a sampler uses."""
        counts = np.bincount(np.asarray(source, np.int64),
                             minlength=vocab_size)[:vocab_size]
        return cls(counts, **kwargs)

    # ------------------------------------------------------------------ #
    # the model interface the evaluator consumes
    # ------------------------------------------------------------------ #

    def score_candidates(self, params, batch: dict,
                         candidates: jnp.ndarray,
                         mesh=None) -> jnp.ndarray:
        """``[B, P, C]`` popularity scores of candidate item ids."""
        safe = jnp.clip(candidates, 0, self._scores.shape[0] - 1)
        scores = jnp.take(self._scores, safe)
        return jnp.where(candidates == safe, scores, NEG_INF)

    def gt_ranks_full_vocab(self, params, inputs: dict, *,
                            exclude: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
        """Full-catalog 1-based GT ranks under the popularity ordering —
        the same law as ``BERT4RecModel.gt_ranks_full_vocab`` (ties ahead
        of the ground truth, GT never self-counts, ``exclude`` ids and
        specials removed from the competitor set)."""
        gt_ids = inputs["masked_lm_ids"].astype(jnp.int32)
        v = self._scores.shape[0]
        logits = jnp.broadcast_to(
            self._scores[None, None, :],
            (*gt_ids.shape, v))                              # [B, P, V]
        gt = jnp.take_along_axis(logits, gt_ids[..., None], axis=-1)
        if exclude is not None:
            from bert4rec_tpu.ops import sharded_topk
            bias = sharded_topk.exclusion_bias(jnp.asarray(exclude), v)
            logits = logits + bias[:, None, :]
        b, p = gt_ids.shape
        logits = logits.at[jnp.arange(b)[:, None],
                           jnp.arange(p)[None, :], gt_ids].set(NEG_INF)
        beaten = jnp.sum((logits >= gt).astype(jnp.int32), axis=-1)
        return beaten + 1
