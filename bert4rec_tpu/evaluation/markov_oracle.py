"""Non-saturating quality benchmark: planted Markov structure with a
computable Bayes-optimal oracle.

Why this exists (round-2 verdict, "what's missing" #1): every earlier
synthetic quality artifact sat at HR@10 0.98-1.0 because the planted rule
(next-in-cycle) was trivially learnable — a saturated benchmark cannot
detect a subtle protocol/masking bug that would cost 5-10% NDCG on real
data. This module plants STOCHASTIC structure instead:

    P(next = j | current = i) = alpha * T[i, j] + (1 - alpha) * pop[j]

where each item ``i`` has ``branching`` random successors with Dirichlet
weights (``T`` rows) and ``pop`` is a Zipf popularity tail. The Bayes-
optimal ranking score for the leave-one-out protocol (mask the LAST item;
reference bert4rec/evaluation/bert4rec_evaluator.py:60-120) is exactly
``log P(candidate | previous item)`` — first-order Markov data means no
other context carries information about the final position. The oracle's
HR@10/NDCG@10 under the identical 101-candidate protocol are therefore
the *ceiling*: a correct model approaches them from below and cannot
materially exceed them, and with alpha < 1 the ceiling sits well inside
(0, 1) — the benchmark cannot saturate.

The oracle is evaluated through :class:`BERT4RecEvaluator` itself (same
sampler law, same seed, same rank law), so model-vs-oracle is a paired
comparison under one protocol implementation; any protocol bug moves both
numbers together EXCEPT bugs the oracle is deliberately blind to, which
the broken variants below expose:

- ``context_offset=-1``: off-by-one context (scores from the token TWO
  back) — detects LOO/position misalignment; metrics must collapse
  toward the popularity mixture floor.
- evaluating with a uniform ("random") sampler instead of "pop_random"
  — detects shuffled/wrong negative sampling; sampled metrics must
  measurably inflate (uniform negatives are easier to beat).
"""

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

NEG_INF = float(np.finfo(np.float32).min)

# catalogs wider than this use the vectorized support sampler: the
# per-row ``rng.choice(..., replace=False, p=pop)`` path is O(n_items)
# PER ROW (it renormalizes the full probability vector), i.e. O(V^2)
# overall — minutes at ML-20M width and ~hours at the Reddit catalog's
# 335k items
FAST_SUPPORT_THRESHOLD = 50_000


def sample_popularity_supports(rng, pop: np.ndarray, n_rows: int,
                               branching: int) -> np.ndarray:
    """``[n_rows, branching]`` popularity-weighted DISTINCT successor
    supports, vectorized: inverse-CDF draws (searchsorted over the
    popularity CDF) with whole-row rejection resampling of rows that
    drew a duplicate.

    Same construction goals as the per-row ``rng.choice(replace=False,
    p=pop)`` path (successors of observed items are themselves observed
    often enough to learn; popularity-weighted supports keep pop_random
    negatives competitive) but a different RNG stream and a slightly
    different without-replacement design (i.i.d.-conditioned-on-distinct
    vs successive sampling) — immaterial to the benchmark, because the
    scorers compute the exact law from the REALIZED supports either way.
    Only used above FAST_SUPPORT_THRESHOLD, so existing small-catalog
    artifacts keep their catalogs bit-for-bit."""
    cdf = np.cumsum(pop)
    cdf[-1] = 1.0  # guard the float edge
    n_items = len(pop)
    succ = np.minimum(
        np.searchsorted(cdf, rng.random((n_rows, branching))), n_items - 1)
    for _ in range(256):
        srt = np.sort(succ, axis=1)
        bad = (srt[:, 1:] == srt[:, :-1]).any(axis=1)
        n_bad = int(bad.sum())
        if not n_bad:
            return succ.astype(np.int64)
        succ[bad] = np.minimum(
            np.searchsorted(cdf, rng.random((n_bad, branching))),
            n_items - 1)
    raise RuntimeError(
        "support resampling failed to produce distinct rows — the "
        "popularity law is too concentrated for distinct "
        f"{branching}-item supports over {n_items} items")


class MarkovCatalog:
    """The planted generative process + its exact conditional law.

    :param n_items: catalog size (token ids ``n_specials ..
        n_specials+n_items-1``).
    :param branching: successors per item (support of each ``T`` row).
    :param alpha: mixture weight on the transition component; the oracle
        ceiling rises with alpha (alpha=1: near-deterministic; alpha=0:
        popularity only).
    :param zipf_s: popularity tail exponent, ``pop ~ rank^-s`` over a
        random permutation (id order carries no signal).
    :param dirichlet: concentration of the successor weights (small =
        peaky rows, large = flat rows).
    """

    def __init__(self, n_items: int, branching: int = 8,
                 alpha: float = 0.6, zipf_s: float = 1.1,
                 dirichlet: float = 1.0, seed: int = 0,
                 n_specials: int = 3):
        rng = np.random.default_rng(seed)
        self.n_items = int(n_items)
        self.n_specials = int(n_specials)
        self.vocab_size = self.n_items + self.n_specials
        self.branching = int(branching)
        self.alpha = float(alpha)

        ranks = rng.permutation(self.n_items).astype(np.float64) + 1.0
        pop = ranks ** -float(zipf_s)
        self.pop = pop / pop.sum()                        # [n_items]

        # per-item successor supports + Dirichlet weights. Supports are
        # drawn from POPULARITY (not uniform): successors of observed
        # items must themselves be observed often enough to learn, and
        # popularity-weighted supports keep the eval's pop_random
        # negatives competitive (uniform supports would make every
        # successor an easy win over popular negatives).
        if self.n_items > FAST_SUPPORT_THRESHOLD:
            # Reddit-catalog width: the per-row choice loop is O(V^2)
            self.succ = sample_popularity_supports(
                rng, self.pop, self.n_items, self.branching)
        else:
            self.succ = np.stack([
                rng.choice(self.n_items, size=self.branching,
                           replace=False, p=self.pop)
                for _ in range(self.n_items)]).astype(np.int64)
        self.w = rng.dirichlet(np.full(self.branching, float(dirichlet)),
                               size=self.n_items)         # [n_items, B]

    # ------------------------------------------------------------------ #
    # the exact law
    # ------------------------------------------------------------------ #

    def next_prob(self) -> np.ndarray:
        """Dense ``[n_items, n_items]`` conditional
        ``P(next | current)`` in ITEM space."""
        m = np.tile(self.pop * (1.0 - self.alpha), (self.n_items, 1))
        np.add.at(m, (np.repeat(np.arange(self.n_items), self.branching),
                      self.succ.ravel()),
                  self.alpha * self.w.ravel())
        return m

    def log_next_prob_matrix(self) -> np.ndarray:
        """``[V, V]`` log-conditional in TOKEN space. Rows for special
        tokens (no usable previous item: sequence start, PAD, MASK, UNK)
        fall back to the popularity marginal — the Bayes predictor with
        no context. Special-token columns score ``-inf`` (never a valid
        next item)."""
        v, s = self.vocab_size, self.n_specials
        out = np.full((v, v), NEG_INF, dtype=np.float32)
        items = np.log(np.maximum(self.next_prob(), 1e-30))
        out[s:, s:] = items
        out[:s, s:] = np.log(np.maximum(self.pop, 1e-30))[None, :]
        return out

    # ------------------------------------------------------------------ #
    # sampling
    # ------------------------------------------------------------------ #

    def sample_sequences(self, n: int, min_len: int, max_len: int,
                         seed: int = 0):
        """``n`` token-id sequences from the process, lengths uniform in
        ``[min_len, max_len]``. Vectorized over sequences: one mixture
        draw per (sequence, step)."""
        rng = np.random.default_rng(seed)
        lens = rng.integers(min_len, max_len + 1, size=n)
        steps = int(lens.max())
        cur = rng.choice(self.n_items, size=n, p=self.pop)
        rows = np.empty((n, steps), dtype=np.int64)
        rows[:, 0] = cur
        cum_w = np.cumsum(self.w, axis=1)                 # [n_items, B]
        for t in range(1, steps):
            use_trans = rng.random(n) < self.alpha
            # transition component: inverse-CDF over the current rows
            r = rng.random(n)
            k = (r[:, None] > cum_w[cur]).sum(axis=1)
            nxt_trans = self.succ[cur, np.minimum(k, self.branching - 1)]
            nxt_pop = rng.choice(self.n_items, size=n, p=self.pop)
            cur = np.where(use_trans, nxt_trans, nxt_pop)
            rows[:, t] = cur
        return [(rows[i, :lens[i]] + self.n_specials).astype(np.int32)
                for i in range(n)]


class MarkovOracleScorer:
    """Bayes-optimal scorer for :class:`MarkovCatalog` data, duck-typed
    to the evaluator's model interface (like
    :class:`~bert4rec_tpu.evaluation.baselines.PopularityScorer`).

    ``context_offset=0`` is the correct oracle (conditions on the token
    immediately before each masked position). ``context_offset=-1`` is
    the DELIBERATELY BROKEN off-by-one variant — it conditions on the
    token two back, the mistake an LOO/position bug would make — used to
    prove the benchmark detects context misalignment.
    """

    # widest vocab whose dense [V, V] law may be materialized by
    # gt_ranks_full_vocab (8k fp32 ~= 256 MiB); ml20m (26.7k ~= 2.9 GiB)
    # and up must use the sparse score_candidates path
    DENSE_VOCAB_LIMIT = 8192

    def __init__(self, catalog: MarkovCatalog, context_offset: int = 0):
        self._cat = catalog
        self._offset = int(context_offset)
        s = catalog.n_specials
        self._s = s
        self._vocab = catalog.vocab_size
        # SPARSE law (scales to any catalog width): P(next|cur) =
        # (1-alpha)*pop[next] everywhere + alpha*w_k on cur's `branching`
        # successors. A dense [V, V] matrix at ML-20M scale is 2.9 GB —
        # captured as a jit CONSTANT by the evaluator's closure, it
        # wedges compilation through the device tunnel. These arrays are
        # O(V * branching).
        pop = catalog.pop
        self._log_pop = jnp.asarray(
            np.log(np.maximum(pop, 1e-30)).astype(np.float32))
        self._log_nonsucc = jnp.asarray(
            np.log(np.maximum((1.0 - catalog.alpha) * pop, 1e-30))
            .astype(np.float32))
        mix = catalog.alpha * catalog.w \
            + (1.0 - catalog.alpha) * pop[catalog.succ]
        self._succ = jnp.asarray(catalog.succ.astype(np.int32))
        self._log_succ = jnp.asarray(
            np.log(np.maximum(mix, 1e-30)).astype(np.float32))
        self._dense = None  # lazy, gt_ranks_full_vocab only

    def _prev_tokens(self, batch: dict) -> jnp.ndarray:
        pos = batch["masked_lm_positions"].astype(jnp.int32)
        prev_idx = jnp.maximum(pos - 1 + self._offset, 0)
        prev = jnp.take_along_axis(batch["input_word_ids"], prev_idx,
                                   axis=1)                # [B, P]
        # a masked position at index 0 reads its own [MASK] token; the
        # special-token rows of the law are the popularity fallback,
        # which is exactly the no-context Bayes predictor
        return jnp.where(pos + self._offset <= 0,
                         jnp.ones_like(prev), prev)

    # ------------------------------------------------------------------ #
    # the model interface the evaluator consumes
    # ------------------------------------------------------------------ #

    def score_candidates(self, params, batch: dict,
                         candidates: jnp.ndarray,
                         mesh=None) -> jnp.ndarray:
        prev = self._prev_tokens(batch)                   # [B, P]
        cand = candidates.astype(jnp.int32)               # [B, P, C]
        s = self._s
        in_range = (cand >= 0) & (cand < self._vocab)
        is_item = cand >= s
        ci = jnp.clip(cand - s, 0, self._log_pop.shape[0] - 1)
        prev_is_item = prev >= s
        prev_item = jnp.clip(prev - s, 0, self._succ.shape[0] - 1)
        base = jnp.where(prev_is_item[..., None],
                         self._log_nonsucc[ci], self._log_pop[ci])
        succ_tok = self._succ[prev_item] + s              # [B, P, K]
        succ_val = self._log_succ[prev_item]              # [B, P, K]
        match = cand[..., :, None] == succ_tok[..., None, :]  # [B,P,C,K]
        matched = jnp.max(jnp.where(match, succ_val[..., None, :],
                                    NEG_INF), axis=-1)
        has = jnp.any(match, axis=-1)
        sc = jnp.where(prev_is_item[..., None] & has, matched, base)
        return jnp.where(in_range & is_item, sc, NEG_INF)

    def gt_ranks_full_vocab(self, params, inputs: dict, *,
                            exclude: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
        """Full-catalog 1-based GT ranks under the oracle ordering, same
        rank law as ``BERT4RecModel.gt_ranks_full_vocab`` (ties ahead of
        the ground truth; ``exclude`` ids and specials never compete).
        Materializes dense [B, P, V] rows — small-catalog use only; the
        hard guard below keeps an accidental catalog-scale call from
        pinning a multi-GB [V, V] matrix on device for the scorer's
        lifetime (the hazard the sparse ``score_candidates`` path
        exists to avoid — ADVICE r4)."""
        if self._vocab > self.DENSE_VOCAB_LIMIT:
            raise ValueError(
                f"gt_ranks_full_vocab materializes a dense [V, V] matrix; "
                f"vocab_size={self._vocab} > {self.DENSE_VOCAB_LIMIT} "
                f"would pin ~{4 * self._vocab**2 / 2**30:.1f} GiB on "
                f"device. Use score_candidates (sparse) at this scale, "
                f"or raise DENSE_VOCAB_LIMIT explicitly.")
        if self._dense is None:
            self._dense = jnp.asarray(self._cat.log_next_prob_matrix())
        gt_ids = inputs["masked_lm_ids"].astype(jnp.int32)
        prev = self._prev_tokens(inputs)
        logits = jnp.take(self._dense, prev, axis=0)      # [B, P, V]
        gt = jnp.take_along_axis(logits, gt_ids[..., None], axis=-1)
        if exclude is not None:
            from bert4rec_tpu.ops import sharded_topk
            bias = sharded_topk.exclusion_bias(jnp.asarray(exclude),
                                               logits.shape[-1])
            logits = logits + bias[:, None, :]
        b, p = gt_ids.shape
        logits = logits.at[jnp.arange(b)[:, None],
                           jnp.arange(p)[None, :], gt_ids].set(NEG_INF)
        beaten = jnp.sum((logits >= gt).astype(jnp.int32), axis=-1)
        return beaten + 1


def host_ranks_from_rows(rows: np.ndarray, gt_ids: np.ndarray,
                         labels: np.ndarray, valid: np.ndarray,
                         vocab_size: int) -> np.ndarray:
    """Shared host-side rank law for the full-ranking Bayes ceilings:
    given per-position score rows ``[B, P, V]``, apply the evaluator's
    exclusion set (the row's labels + ground truths), never let the GT
    self-count, count ties ahead of the GT, and return the valid ranks."""
    b, p = gt_ids.shape
    gt = np.take_along_axis(rows, gt_ids[..., None], axis=-1)
    excl = np.zeros((b, vocab_size), bool)
    np.put_along_axis(excl, np.where(labels > 0, labels, 0),
                      labels > 0, axis=1)
    np.put_along_axis(excl, np.where(valid, gt_ids, 0), valid, axis=1)
    rows = np.where(excl[:, None, :], NEG_INF, rows)
    np.put_along_axis(rows, gt_ids[..., None], NEG_INF, axis=-1)
    ranks = (rows >= gt).sum(axis=-1) + 1                 # [B, P]
    return ranks[valid]


def host_full_ranking_oracle(catalog, test_ds, *, context_offset: int = 0,
                             batch_size: int = 256):
    """Full-catalog (unsampled) GT ranks + metrics of the Bayes oracle,
    computed on HOST numpy — the paired ceiling for the evaluator's
    ``full_ranking=True`` protocol.

    The device-dense path is guarded (``DENSE_VOCAB_LIMIT``: a [V, V]
    jit constant wedges compilation through the device tunnel and pins
    multi-GB device memory), but on the host the dense law is a plain
    numpy array — 2.9 GB at ML-20M width, seconds of compute. Catalogs
    whose dense law exceeds host comfort (Reddit's 335k -> ~450 GB) must
    skip the ceiling; callers check :meth:`fits_host_dense`.

    Same rank law and exclusion set as
    ``BERT4RecEvaluator._evaluate_batch_full``: competitors exclude the
    row's labels and ground truths; ties count ahead of the GT; the GT
    never self-counts. Metrics via the same metric classes the evaluator
    uses, so the numbers are directly comparable.

    :returns: ``(metrics dict, ranks np.ndarray)``
    """
    from bert4rec_tpu.evaluation.bert4rec_evaluator import default_metrics

    logm = catalog.log_next_prob_matrix()                 # [V, V] fp32
    v = catalog.vocab_size
    metrics = default_metrics()
    all_ranks = []
    for batch in test_ds.batches(batch_size, shuffle=False, seed=0):
        labels = np.asarray(batch["labels"])
        gt_ids = np.asarray(batch["masked_lm_ids"]).astype(np.int64)
        weights = np.asarray(batch["masked_lm_weights"])
        pos = np.asarray(batch["masked_lm_positions"]).astype(np.int64)
        ids = np.asarray(batch["input_word_ids"])
        valid = weights > 0

        # numpy twin of MarkovOracleScorer._prev_tokens
        prev_idx = np.maximum(pos - 1 + context_offset, 0)
        prev = np.take_along_axis(ids, prev_idx, axis=1)
        prev = np.where(pos + context_offset <= 0, 1, prev)

        rows = logm[prev]                                 # [B, P, V]
        r = host_ranks_from_rows(rows, gt_ids, labels, valid, v)
        all_ranks.append(r)
        for m in metrics:
            m.update_batch(r)
    return ({m.name: m.result() for m in metrics},
            np.concatenate(all_ranks) if all_ranks else np.empty(0))


def fits_host_dense(catalog, budget_bytes: int = 16 * 2**30) -> bool:
    """True if the catalog's dense [V, V] fp32 law fits the host budget."""
    return 4 * catalog.vocab_size ** 2 <= budget_bytes


def evaluate_scorer(scorer, params, test_ds, *, source: Sequence[int],
                    sample_size: int = 100, seed: int = 0,
                    sampler: str = "pop_random",
                    batch_size: int = 256, mesh=None) -> dict:
    """Run any model/scorer through the standard evaluator with a fully
    pinned sampler — the helper that makes model-vs-oracle a PAIRED
    comparison (same negatives law, same seed, same rank law).

    ``sampler='random'`` is the deliberately-broken shuffled-negatives
    variant (uniform instead of popularity-weighted draws). ``mesh``
    scores over a device mesh (sharded params)."""
    from bert4rec_tpu.dataloaders import samplers
    from bert4rec_tpu.evaluation import BERT4RecEvaluator

    s = samplers.get(sampler, source=list(source),
                     vocab=list(dict.fromkeys(source)),
                     sample_size=sample_size, seed=seed)
    evaluator = BERT4RecEvaluator(sampler=s, sample_size=sample_size,
                                  seed=seed, mesh=mesh)
    return evaluator.evaluate(scorer, params, test_ds,
                              batch_size=batch_size, progress_bar=False)
