"""Non-saturating quality benchmark for the TEMPORAL model family:
planted TIME-ROUTED Markov structure with TWO computable ceilings.

Why this exists: the temporal family (recency embeddings + relative-time
attention bias) was quality-gated only by the tiny-scale copy-by-time-
delta smoke (tools/quality_run.py run_smoke_temporal) — a rule-learned/
not-learned separation with no Bayes ceiling, so "how close to optimal"
was unmeasurable. This module plants a process where the time signal
ROUTES the transition's context position:

    context(t) = item[t-1]  if the gap before event t is short ("fast")
               = item[t-2]  if the gap is long ("slow")
    P(item[t] = j | context c) = alpha * T[c, j] + (1 - alpha) * pop[j]

with ONE transition world T over a Zipf popularity. Regimes are
equiprobable and gap lengths are regime-deterministic, so every event's
regime is exactly decodable from the timestamps — the same signal the
model's pairwise log2 time-delta buckets see
(bert4rec_encoder._time_bucket_matrix). This is the law the temporal
ATTENTION mechanism natively expresses (attend to t-1 or t-2 depending
on the gap bucket, then apply one learned transition): the architecture
learns T once plus a time-gated routing, rather than two full transition
worlds. An earlier two-independent-worlds design was measured
UNLEARNABLE-in-budget: the model reached 89% of its ceiling at 4x the
markov gate's epoch budget yet still sat BELOW the time-blind bound,
because it had to estimate two transition tables from the same data.

Two Bayes ceilings bracket the value of the time signal under the
identical 101-candidate leave-one-out protocol (reference
bert4rec/evaluation/bert4rec_evaluator.py:60-120):

- the TEMPORAL oracle decodes the regime and conditions on the routed
  context — the ceiling for a time-aware model;
- the TIME-BLIND oracle is the best scorer that cannot see timestamps:
  the regime-marginal law ``0.5 * (P(.|item[t-1]) + P(.|item[t-2]))``
  (positions are visible to it; only time is not).

A correct temporal model approaches the first from below AND measurably
beats the second (proof it uses time); an identically-trained time-blind
ablation is BOUNDED by the second. Both ceilings sit inside (0, 1) — the
benchmark cannot saturate. Deliberately-broken variants (off-by-one
context — which shifts the routing AND the decoded gap — and shuffled
negatives) must fail exactly as in :mod:`markov_oracle`.

Generation edge: the first step (t=1) has no ``item[t-2]`` and is forced
"fast"; scorers treat positions without a second-back context the same
way (decodable from the position index alone, so the blind oracle is
allowed to use it).
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

NEG_INF = float(np.finfo(np.float32).min)


class TemporalMarkovCatalog:
    """The planted time-routed generative process + its exact laws.

    :param gaps: per-regime inter-event gap in seconds ``(fast, slow)``.
        Regime-deterministic gaps keep the regime exactly decodable; the
        defaults land in well-separated log2 buckets (11 vs 15) of the
        model's bucket law.
    """

    def __init__(self, n_items: int, branching: int = 8,
                 alpha: float = 0.6, zipf_s: float = 1.1,
                 dirichlet: float = 1.0, seed: int = 0,
                 n_specials: int = 3, gaps=(3_600, 43_200),
                 t0: int = 1_600_000_000):
        rng = np.random.default_rng(seed)
        self.n_items = int(n_items)
        self.n_specials = int(n_specials)
        self.vocab_size = self.n_items + self.n_specials
        self.branching = int(branching)
        self.alpha = float(alpha)
        self.gaps = (int(gaps[0]), int(gaps[1]))
        assert self.gaps[0] < self.gaps[1]
        self.t0 = int(t0)

        ranks = rng.permutation(self.n_items).astype(np.float64) + 1.0
        pop = ranks ** -float(zipf_s)
        self.pop = pop / pop.sum()                        # [n_items]

        # ONE successor world (supports popularity-drawn for
        # learnability, as in MarkovCatalog; the vectorized sampler
        # kicks in at Reddit-catalog width where the per-row loop is
        # O(V^2))
        from bert4rec_tpu.evaluation.markov_oracle import (
            FAST_SUPPORT_THRESHOLD, sample_popularity_supports,
        )
        if self.n_items > FAST_SUPPORT_THRESHOLD:
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
    # exact laws
    # ------------------------------------------------------------------ #

    def cond_prob(self) -> np.ndarray:
        """Dense ``[n_items, n_items]`` ``P(next | routed context)`` —
        row ``c`` is the mixture law given the routed context item."""
        m = np.tile(self.pop * (1.0 - self.alpha), (self.n_items, 1))
        np.add.at(m, (np.repeat(np.arange(self.n_items), self.branching),
                      self.succ.ravel()),
                  self.alpha * self.w.ravel())
        return m

    @property
    def regime_threshold_s(self) -> float:
        """Gap threshold separating the regimes (geometric midpoint)."""
        return float(np.sqrt(self.gaps[0]) * np.sqrt(self.gaps[1]))

    # ------------------------------------------------------------------ #
    # sampling
    # ------------------------------------------------------------------ #

    def sample_sequences(self, n: int, min_len: int, max_len: int,
                         seed: int = 0):
        """``n`` (token-id sequence, int64 timestamp sequence) pairs.
        Per step: regime ~ Bernoulli(0.5) (forced fast at t=1); the gap
        before the event is ``gaps[regime]``; the item follows the
        mixture law conditioned on the ROUTED context (one or two
        back)."""
        rng = np.random.default_rng(seed)
        lens = rng.integers(min_len, max_len + 1, size=n)
        steps = int(lens.max())
        cur = rng.choice(self.n_items, size=n, p=self.pop)
        rows = np.empty((n, steps), dtype=np.int64)
        ts = np.empty((n, steps), dtype=np.int64)
        rows[:, 0] = cur
        ts[:, 0] = self.t0
        cum_w = np.cumsum(self.w, axis=1)                 # [n_items, B]
        gaps = np.asarray(self.gaps)
        for t in range(1, steps):
            regime = (rng.random(n) < 0.5).astype(np.int64)
            if t == 1:
                regime[:] = 0  # no item[t-2] yet
            ts[:, t] = ts[:, t - 1] + gaps[regime]
            ctx = np.where(regime == 0, rows[:, t - 1],
                           rows[:, max(t - 2, 0)])
            use_trans = rng.random(n) < self.alpha
            r = rng.random(n)
            k = (r[:, None] > cum_w[ctx]).sum(axis=1)
            nxt_trans = self.succ[ctx, np.minimum(k, self.branching - 1)]
            nxt_pop = rng.choice(self.n_items, size=n, p=self.pop)
            rows[:, t] = np.where(use_trans, nxt_trans, nxt_pop)
        seqs = [(rows[i, :lens[i]] + self.n_specials).astype(np.int32)
                for i in range(n)]
        tss = [ts[i, :lens[i]].copy() for i in range(n)]
        return seqs, tss


class TemporalOracleScorer:
    """Bayes-optimal scorer for :class:`TemporalMarkovCatalog` data,
    duck-typed to the evaluator's model interface.

    :param time_blind: score with the regime-MARGINAL law (never reads
        timestamps; positions remain visible) — the computable ceiling
        for time-blind models.
    :param context_offset: 0 = correct; -1 = the deliberately-broken
        off-by-one variant (routes from the tokens one further back AND
        decodes the regime from the shifted gap — the consistent mistake
        an LOO/position bug would make).

    Sparse law (scales to any catalog): score = log((1-alpha)*pop[cand]
    + matched successor contributions of the routed context); special-
    token context falls back to the popularity marginal.
    """

    def __init__(self, catalog: TemporalMarkovCatalog,
                 time_blind: bool = False, context_offset: int = 0):
        self._cat = catalog
        self._blind = bool(time_blind)
        self._offset = int(context_offset)
        s = catalog.n_specials
        self._s = s
        self._vocab = catalog.vocab_size
        self._threshold = catalog.regime_threshold_s
        pop = catalog.pop
        self._pop = jnp.asarray(pop.astype(np.float32))
        self._base = jnp.asarray(
            ((1.0 - catalog.alpha) * pop).astype(np.float32))
        self._succ = jnp.asarray(catalog.succ.astype(np.int32))
        self._contrib = jnp.asarray(
            (catalog.alpha * catalog.w).astype(np.float32))

    def _contexts(self, batch: dict):
        """Per masked position: the one-back and two-back tokens, the
        no-context / no-second-back flags, and (unless blind) the
        decoded regime."""
        pos = batch["masked_lm_positions"].astype(jnp.int32)
        ids = batch["input_word_ids"]
        i1 = jnp.maximum(pos - 1 + self._offset, 0)
        i2 = jnp.maximum(pos - 2 + self._offset, 0)
        prev1 = jnp.take_along_axis(ids, i1, axis=1)      # [B, P]
        prev2 = jnp.take_along_axis(ids, i2, axis=1)
        no_ctx = pos + self._offset <= 0
        no_second = pos - 2 + self._offset < 0
        prev1 = jnp.where(no_ctx, jnp.ones_like(prev1), prev1)
        if self._blind:
            regime = None
        else:
            # int32 like the encoder's bucket law: differences of
            # seconds-resolution stamps are exact under 2^31 s, and jax
            # truncates an int64 request without x64 anyway
            ts = batch["input_timestamps"].astype(jnp.int32)
            cur_idx = jnp.maximum(pos + self._offset, 0)
            gap = (jnp.take_along_axis(ts, cur_idx, axis=1)
                   - jnp.take_along_axis(ts, i1, axis=1))
            regime = (gap.astype(jnp.float32)
                      > self._threshold).astype(jnp.int32)
        return prev1, prev2, no_ctx, no_second, regime

    def _matched_mass(self, ctx_tok, cand, ci):
        """[B, P, C] successor-mixture mass of ``cand`` given context
        tokens ``ctx_tok`` ([B, P]); 0 where the context is a special
        token (the popularity fallback is applied by the caller)."""
        s = self._s
        ctx_is_item = ctx_tok >= s
        ctx_item = jnp.clip(ctx_tok - s, 0, self._pop.shape[0] - 1)
        succ_tok = self._succ[ctx_item] + s               # [B, P, K]
        contrib = self._contrib[ctx_item]                 # [B, P, K]
        match = cand[..., :, None] == succ_tok[..., None, :]  # [B,P,C,K]
        extra = jnp.sum(jnp.where(match, contrib[..., None, :], 0.0),
                        axis=-1)
        p = self._base[ci] + extra
        return jnp.where(ctx_is_item[..., None], p, self._pop[ci])

    # ------------------------------------------------------------------ #
    # the model interface the evaluator consumes
    # ------------------------------------------------------------------ #

    def score_candidates(self, params, batch: dict,
                         candidates: jnp.ndarray,
                         mesh=None) -> jnp.ndarray:
        prev1, prev2, no_ctx, no_second, regime = self._contexts(batch)
        cand = candidates.astype(jnp.int32)               # [B, P, C]
        s = self._s
        in_range = (cand >= 0) & (cand < self._vocab)
        is_item = cand >= s
        ci = jnp.clip(cand - s, 0, self._pop.shape[0] - 1)
        p1 = self._matched_mass(prev1, cand, ci)          # [B, P, C]
        p2 = self._matched_mass(prev2, cand, ci)
        if self._blind:
            # regime-marginal; positions without a second-back context
            # are structurally "fast" (visible without timestamps)
            p = jnp.where(no_second[..., None], p1, 0.5 * (p1 + p2))
        else:
            use2 = (regime == 1) & ~no_second
            p = jnp.where(use2[..., None], p2, p1)
        p = jnp.where(no_ctx[..., None], self._pop[ci], p)
        sc = jnp.log(jnp.maximum(p, 1e-30))
        return jnp.where(in_range & is_item, sc, NEG_INF)


def host_full_ranking_temporal_oracle(catalog, test_ds, *,
                                      time_blind: bool = False,
                                      batch_size: int = 256):
    """Full-catalog (unsampled) GT ranks + metrics of the temporal (or
    time-blind) Bayes ceiling, computed on HOST numpy — the paired
    ceilings for ``BERT4RecEvaluator(full_ranking=True)`` on the
    temporal family, twin of ``markov_oracle.host_full_ranking_oracle``.

    Mirrors :class:`TemporalOracleScorer` exactly: the per-position
    context is routed one or two back by the decoded gap regime
    (``time_blind`` scores the regime-MARGINAL law instead — probability
    mixture of both routed contexts; positions without a second-back
    context are structurally "fast"); special-token contexts fall back
    to the popularity marginal; the rank/exclusion law is the shared
    :func:`markov_oracle.host_ranks_from_rows`. Catalogs whose dense law
    exceeds host RAM must skip (check ``markov_oracle.fits_host_dense``).

    :returns: ``(metrics dict, ranks np.ndarray)``
    """
    from bert4rec_tpu.evaluation.bert4rec_evaluator import default_metrics
    from bert4rec_tpu.evaluation.markov_oracle import host_ranks_from_rows

    s, v = catalog.n_specials, catalog.vocab_size
    threshold = catalog.regime_threshold_s
    # token-space dense conditional in PROBABILITY space (blind mixing
    # happens in prob space); float32 throughout — the fp64 tile at
    # ML-20M width would double the host footprint
    probs = np.zeros((v, v), np.float32)
    base = (catalog.pop * (1.0 - catalog.alpha)).astype(np.float32)
    probs[s:, s:] = base[None, :]
    np.add.at(probs[s:, s:],
              (np.repeat(np.arange(catalog.n_items), catalog.branching),
               catalog.succ.ravel()),
              (catalog.alpha * catalog.w).ravel().astype(np.float32))
    probs[:s, s:] = catalog.pop.astype(np.float32)[None, :]

    metrics = default_metrics()
    all_ranks = []
    for batch in test_ds.batches(batch_size, shuffle=False, seed=0):
        labels = np.asarray(batch["labels"])
        gt_ids = np.asarray(batch["masked_lm_ids"]).astype(np.int64)
        weights = np.asarray(batch["masked_lm_weights"])
        pos = np.asarray(batch["masked_lm_positions"]).astype(np.int64)
        ids = np.asarray(batch["input_word_ids"])
        valid = weights > 0

        # numpy twin of TemporalOracleScorer._contexts (offset 0)
        i1 = np.maximum(pos - 1, 0)
        i2 = np.maximum(pos - 2, 0)
        prev1 = np.take_along_axis(ids, i1, axis=1)
        prev2 = np.take_along_axis(ids, i2, axis=1)
        no_ctx = pos <= 0
        no_second = pos - 2 < 0
        prev1 = np.where(no_ctx, 1, prev1)

        p1 = probs[prev1]                                 # [B, P, V]
        if time_blind:
            p2 = probs[prev2]
            p = np.where(no_second[..., None], p1, 0.5 * (p1 + p2))
        else:
            ts = np.asarray(batch["input_timestamps"]).astype(np.int64)
            gap = (np.take_along_axis(ts, np.maximum(pos, 0), axis=1)
                   - np.take_along_axis(ts, i1, axis=1))
            use2 = (gap.astype(np.float64) > threshold) & ~no_second
            ctx = np.where(use2, prev2, prev1)
            p = probs[ctx]
        rows = np.log(np.maximum(p, 1e-30))
        rows[:, :, :s] = NEG_INF                          # specials never score
        r = host_ranks_from_rows(rows, gt_ids, labels, valid, v)
        all_ranks.append(r)
        for m in metrics:
            m.update_batch(r)
    return ({m.name: m.result() for m in metrics},
            np.concatenate(all_ranks) if all_ranks else np.empty(0))
