"""Sampled-negative ranking evaluator — the reference protocol, vectorized.

Protocol parity with reference ``bert4rec/evaluation/bert4rec_evaluator.py``:
default metrics ``[Counter("Valid Ranks"), NDCG@1/5/10, HR@1/5/10, MAP]``
(:12-21); default sampler "pop_random" with sample_size=100, source/vocab
auto-built from the dataloader (:26-44); per masked position the exclusion
set is the sequence's full label list + the ground truth, 100 negatives are
drawn and the ground truth appended => 101 candidates (:90-104); the metric
update is the 1-based rank of the ground truth (:112-120). Ties rank ahead of
the ground truth, matching the reference's stable descending argsort with the
ground truth gathered last.

TPU-native difference (SURVEY.md §3.3: eval was the reference's slowest
path — per-position python sampling + host argsort): negatives for ALL
masked positions of a batch are drawn in one vectorized Gumbel-top-k pass,
and ranks for the whole batch come from ONE jitted forward + candidate
gather: rank = 1 + #{negatives with logit >= gt logit}.
"""

import warnings
import weakref
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class _PerModelCache:
    """Bounded id(model)-keyed cache whose entries only hit while the SAME
    model object is alive: each entry stores a weakref to its model, and a
    lookup that finds a dead or different referent evicts the entry instead
    of serving a stale compiled closure (CPython reuses ids after GC, so a
    bare ``id(model)`` key could silently return another model's jit).

    The cache is BOUNDED (LRU, ``max_entries``) because the cached value —
    a jitted closure — strongly references its model: an unbounded cache
    would keep every model a long-lived evaluator ever saw alive (plus the
    fused entries' vocab-sized device constants). Evicting a live model's
    entry merely recompiles on next use."""

    def __init__(self, max_entries: int = 4):
        self._entries = {}
        self._max_entries = max_entries

    def get(self, model):
        entry = self._entries.get(id(model))
        if entry is None:
            return None
        ref, value = entry
        referent = ref() if isinstance(ref, weakref.ref) else ref
        if referent is model:
            # refresh LRU position (dicts preserve insertion order)
            del self._entries[id(model)]
            self._entries[id(model)] = entry
            return value
        del self._entries[id(model)]
        return None

    def set(self, model, value):
        try:
            ref = weakref.ref(model)
        except TypeError:  # non-weakrefable model: pin it (identity exact)
            ref = model
        self._entries[id(model)] = (ref, value)
        while len(self._entries) > self._max_entries:
            self._entries.pop(next(iter(self._entries)))

from bert4rec_tpu.evaluation import evaluation_metrics as metrics_lib
from bert4rec_tpu.evaluation.base_evaluator import BaseEvaluator


def default_metrics() -> List[metrics_lib.EvaluationMetric]:
    return [
        metrics_lib.Counter("Valid Ranks"),
        metrics_lib.NDCG(1), metrics_lib.NDCG(5), metrics_lib.NDCG(10),
        metrics_lib.HR(1), metrics_lib.HR(5), metrics_lib.HR(10),
        metrics_lib.MAP(),
    ]


class BERT4RecEvaluator(BaseEvaluator):

    def __init__(self, metrics: Optional[list] = None,
                 sampler="pop_random",
                 dataloader=None,
                 sample_size: int = 100,
                 seed: Optional[int] = None,
                 mesh=None,
                 device_negatives: Optional[bool] = None,
                 static_shapes: Optional[bool] = None,
                 full_ranking: bool = False,
                 fetch_workers: int = 2):
        """``mesh``: optional ``jax.sharding.Mesh`` — batches and candidate
        tensors are sharded over its 'data' axis so the scoring forward runs
        data-parallel across chips (rank reduction stays on host).

        ``device_negatives``: draw the popularity-weighted negatives inside
        the jitted eval computation (ops/negative_sampling.py) instead of on
        the host — same distribution, different PRNG streams. Default
        (None): auto-enabled when the sampler exposes a popularity
        distribution over an integer-id vocab. The host path remains the
        oracle (``device_negatives=False``).

        ``static_shapes``: use data-independent tensor shapes (no P-slicing,
        fixed exclusion width). Auto-enabled for multi-host runs, where every
        process must assemble identically-shaped global arrays.

        ``full_ranking``: rank each ground truth against the ENTIRE catalog
        instead of 100 sampled negatives — the unbiased protocol (sampled
        metrics are biased estimators; Krichene & Rendle, KDD 2020). No
        sampler is built or used; the exclusion semantics match the sampled
        path (the row's other interactions never compete). Metric names are
        unchanged, so results are directly comparable files.

        ``fetch_workers``: rank fetches (device->host) run on this many
        worker threads so the evaluate loop never blocks on a fetch
        round trip between dispatches. Measured on the tunneled v5e at
        ML-20M scale: 36.9 -> 22.4 ms/batch (1.07x the train step) with 2
        workers, rank-for-rank identical output. 0 disables threading
        (strictly sequential dispatch->fetch, the r1 behavior)."""
        sampler_config = {"sample_size": sample_size}
        if seed is not None:
            sampler_config["seed"] = seed
        super().__init__(metrics if metrics is not None else default_metrics(),
                         None if full_ranking else sampler,
                         dataloader, sampler_config)
        self.full_ranking = full_ranking
        self.fetch_workers = max(0, int(fetch_workers))
        self.sample_size = sample_size
        self.seed = seed
        self.mesh = mesh
        self.device_negatives = device_negatives
        self.static_shapes = static_shapes
        self._rank_fn_cache = _PerModelCache()
        self._fused_fn_cache = _PerModelCache()
        self._full_fn_cache = _PerModelCache()
        self._batch_counter = 0

    # ------------------------------------------------------------------ #

    def _prepare_sampler(self):
        """Auto-build source/vocab from the dataloader
        (reference bert4rec_evaluator.py:26-44)."""
        if self.sampler is None:  # full-ranking protocol: sampler-free
            return
        if self.sampler.is_fully_prepared():
            return
        if self.dataloader is None:
            raise ValueError(
                "The sampler is not fully prepared (missing source/vocab) "
                "and no dataloader is available to derive them from.")
        source = self.dataloader.create_item_list_tokenized()
        self.sampler.set_source(list(source))
        self.sampler.set_vocab(list(dict.fromkeys(source)))
        if self.sampler.sample_size is None:
            self.sampler.set_sample_size(self.sample_size)

    def _rank_fn(self, model):
        """One jitted computation: forward -> candidate logits -> gt rank.

        Uses the candidate-only scoring path when the model provides it
        (never materializing [B, P, V] full-vocab logits); falls back to
        full logits + gather for duck-typed models.
        """
        cached = self._rank_fn_cache.get(model)
        if cached is None:
            import inspect
            mesh = self.mesh
            has_sc = hasattr(model, "score_candidates")
            sc_kwargs = {}
            if has_sc and "mesh" in inspect.signature(
                    model.score_candidates).parameters:
                sc_kwargs = {"mesh": mesh}

            def ranks(params, batch, candidates):
                if has_sc:
                    cand = model.score_candidates(params, batch, candidates,
                                                  **sc_kwargs)
                else:
                    out = model.apply(params, batch)
                    cand = jnp.take_along_axis(out["mlm_logits"], candidates,
                                               axis=-1)
                gt = cand[..., -1:]
                beaten = jnp.sum((cand[..., :-1] >= gt).astype(jnp.int32),
                                 axis=-1)
                # invalid positions -> rank 0, so hosts can filter the
                # (replicated, possibly global) output without needing a
                # local-shaped validity mask
                return jnp.where(batch["masked_lm_weights"] > 0,
                                 beaten + 1, 0)  # [B, P]
            if self.mesh is not None:
                # replicate the (tiny) rank output so every host can read it
                out_sharding = jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec())
                cached = jax.jit(ranks, out_shardings=out_sharding)
            else:
                cached = jax.jit(ranks)
            self._rank_fn_cache.set(model, cached)
        return cached

    # ------------------------------------------------------------------ #
    # device-side negative sampling (VERDICT r1 #3)
    # ------------------------------------------------------------------ #

    @property
    def _static_shapes(self) -> bool:
        if self.static_shapes is not None:
            return self.static_shapes
        return jax.process_count() > 1

    def _place_on_mesh(self, arrays: dict) -> dict:
        """Shard every ``[B, ...]`` leaf's leading dim over 'data' —
        assembling per-process local slices into distributed global arrays
        under multi-host, plain device_put otherwise."""
        if self.mesh is None:
            return arrays
        from bert4rec_tpu.core import partitioning
        return partitioning.place_batch(self.mesh, arrays,
                                        what="evaluation batch")

    def _device_sampling_available(self) -> bool:
        if self.device_negatives is False:
            return False
        s = self.sampler
        ok = (getattr(s, "_probs", None) is not None
              and callable(getattr(s, "_int_id_lut", None))
              and s._int_id_lut() is not None)
        if not ok and self.device_negatives is True:
            # an explicit True that cannot be honored must not silently
            # degrade to the ~10x-slower host path
            raise ValueError(
                "device_negatives=True requires a sampler with a "
                "popularity distribution and an integer-id vocab "
                "(pop_random over int item ids); this sampler exposes "
                "neither — drop the flag to auto-select or pass "
                "device_negatives=False for the host path")
        return ok

    def _fused_rank_fn(self, model):
        """One jitted computation per (model, sampler distribution):
        Gumbel-top-k negatives -> candidate scoring -> gt ranks."""
        from bert4rec_tpu.ops import negative_sampling as ns
        cached = self._fused_fn_cache.get(model)
        if cached is not None:
            # the closure bakes in the distribution: invalidate when the
            # sampler's probs array is no longer the same object (identity,
            # not id() — GC can reuse ids)
            probs_ref, fn = cached
            if probs_ref is self.sampler._probs:
                return fn
        probs = self.sampler._probs
        logp = ns.popularity_logp(probs)
        vocab_ids = jnp.asarray(np.asarray(self.sampler.vocab), jnp.int32)
        sample_size = self.sample_size

        mesh = self.mesh

        def fused(params, batch, without_idx, base_key, counter):
            # fold inside the jit: one dispatch per batch instead of
            # extra eager RNG ops (per-op overhead is ~ms through the
            # tunneled TPU)
            rng_key = jax.random.fold_in(base_key, counter)
            return ns.ranks_with_device_negatives(
                model, params, batch, logp=logp, vocab_ids=vocab_ids,
                without_idx=without_idx, key=rng_key,
                sample_size=sample_size, mesh=mesh)

        if self.mesh is not None:
            out_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec())
            fn = jax.jit(fused, out_shardings=out_sharding)
        else:
            fn = jax.jit(fused)
        self._fused_fn_cache.set(model, (probs, fn))
        return fn

    def _build_without_idx(self, labels, gt_ids, valid) -> np.ndarray:
        """``[B, P, W]`` sampler-vocab indices to exclude per position: the
        sequence's labels + the ground truth (reference :90-95), padded with
        ``len(vocab)`` (dropped by the device scatter). W is padded to a
        power of two so one compiled kernel serves many batches."""
        lut = self.sampler._int_id_lut()
        b, p = gt_ids.shape
        s = labels.shape[1]
        v = len(self.sampler.vocab)
        # one vectorized pass: map every label through the id->vocab-index
        # LUT; pads / out-of-vocab ids become v (dropped by the device
        # scatter). Duplicate exclusions are harmless.
        in_range = (labels > 0) & (labels < len(lut))
        idx = lut[np.where(in_range, labels, 0)]
        idx = np.where(in_range & (idx >= 0), idx, v).astype(np.int32)

        width = max(8, 1 << s.bit_length())  # >= s + 1, data-independent
        out = np.full((b, p, width), v, dtype=np.int32)
        out[:, :, :s] = idx[:, None, :]
        safe_gt = np.where(gt_ids < len(lut), gt_ids, 0)
        gt_idx = lut[safe_gt]
        rows, cols = np.nonzero(valid & (gt_idx >= 0))
        out[rows, cols, -1] = gt_idx[rows, cols]
        # the jitted sampler cannot raise: warn once if any row's exclusion
        # set could exhaust the positive-mass pool — top-k would then
        # silently return excluded/zero-mass items as negatives, inflating
        # HR/NDCG (the host sampler raises on this same condition)
        if not getattr(self, "_warned_small_pool", False):
            pool = int(np.count_nonzero(self.sampler._probs > 0))
            max_excl = int((out != v).sum(axis=-1).max(initial=0))
            if pool - max_excl < self.sample_size:
                self._warned_small_pool = True
                warnings.warn(
                    f"negative-sampling pool may be too small: {pool} "
                    f"items carry probability mass, up to {max_excl} are "
                    f"excluded per position, sample_size="
                    f"{self.sample_size} — short rows will receive "
                    f"excluded/zero-mass items as negatives")
        return out

    def _evaluate_batch_device(self, model, params, batch, labels,
                               gt_ids, valid, fetch: bool = True):
        without_idx = self._build_without_idx(labels, gt_ids, valid)
        if getattr(self, "_base_key", None) is None:
            if self.seed is not None:
                seed = self.seed
            else:
                # host-oracle parity: default_rng(None) draws fresh
                # negatives per run. One OS-entropy draw per evaluate(),
                # broadcast so every host feeds the identical replicated
                # key into the jitted computation
                seed = int(np.random.SeedSequence().generate_state(1)[0])
                if jax.process_count() > 1:
                    from jax.experimental import multihost_utils
                    seed = int(multihost_utils.broadcast_one_to_all(
                        np.uint32(seed)))
            self._base_key = jax.random.key(np.uint32(seed))
        counter = np.int32(self._batch_counter)
        self._batch_counter += 1

        feature_batch = {k: v for k, v in batch.items()
                         if k not in ("labels", "example_weights")}
        placed = self._place_on_mesh(
            {**feature_batch, "without": jnp.asarray(without_idx)})
        without = placed.pop("without")
        ranks = self._fused_rank_fn(model)(
            params, placed, without, self._base_key, counter)
        if not fetch:
            return ranks  # device array; caller fetches + filters > 0
        ranks = np.asarray(ranks)
        return ranks[ranks > 0]  # global batch in multi-host runs

    # ------------------------------------------------------------------ #
    # full-vocab (unsampled) ranking
    # ------------------------------------------------------------------ #

    def _full_rank_fn(self, model):
        """One jitted computation: forward -> count catalog items tying or
        beating the ground truth (``model.gt_ranks_full_vocab``)."""
        cached = self._full_fn_cache.get(model)
        if cached is not None:
            return cached

        def ranks(params, batch, exclude):
            r = model.gt_ranks_full_vocab(params, batch, exclude=exclude)
            # invalid positions -> 0, same host-filter contract as _rank_fn
            return jnp.where(batch["masked_lm_weights"] > 0, r, 0)

        if self.mesh is not None:
            out_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec())
            fn = jax.jit(ranks, out_shardings=out_sharding)
        else:
            fn = jax.jit(ranks)
        self._full_fn_cache.set(model, fn)
        return fn

    def _evaluate_batch_full(self, model, params, batch, labels,
                             gt_ids, valid, fetch: bool = True):
        """Full-catalog GT ranks for one batch. The competitor exclusion set
        per row is the sampled protocol's: the sequence's labels + the
        ground truths (the GT never self-counts regardless)."""
        exclude = np.concatenate(
            [np.where(labels > 0, labels, -1),
             np.where(valid, gt_ids, -1)], axis=1).astype(np.int32)
        feature_batch = {k: v for k, v in batch.items()
                         if k not in ("labels", "example_weights")}
        placed = self._place_on_mesh(
            {**feature_batch, "exclude": jnp.asarray(exclude)})
        exclude = placed.pop("exclude")
        ranks = self._full_rank_fn(model)(params, placed, exclude)
        if not fetch:
            return ranks  # device array; caller fetches + filters > 0
        ranks = np.asarray(ranks)
        return ranks[ranks > 0]  # global batch in multi-host runs

    # ------------------------------------------------------------------ #

    def _sample_negatives(self, without_lists, n: int) -> np.ndarray:
        """[N, sample_size] negative ids, one row per masked position."""
        vocab_arr = np.asarray(self.sampler.vocab)
        if hasattr(self.sampler, "sample_batch"):
            idx = self.sampler.sample_batch(without_lists, self.sample_size)
            return vocab_arr[idx]
        rows = [self.sampler.sample(self.sample_size, without=list(w))
                for w in without_lists]
        return np.asarray(rows)

    def evaluate_batch(self, model, params, batch: dict,
                       fetch: bool = True) -> np.ndarray:
        """Rank ground truths of one feature batch; returns the valid ranks.

        ``fetch=False`` returns the raw device ``[B, P]`` rank array
        (0 = invalid position) without blocking — the evaluate loop uses it
        to overlap batch k's device compute with batch k+1's host prep."""
        labels = np.asarray(batch["labels"])
        positions = np.asarray(batch["masked_lm_positions"])
        gt_ids = np.asarray(batch["masked_lm_ids"])
        weights = np.asarray(batch["masked_lm_weights"])
        b, p = positions.shape
        valid = weights > 0

        # masked slots fill in ascending order, so valid slots are a prefix
        # per row: slice P down to the max used (1 for the LOO protocol).
        # Multi-host runs keep the full P — the slice width is data-dependent
        # and per-process, so it would desync the global batch assembly.
        p_used = max(int(valid.sum(axis=1).max(initial=0)), 1)
        if self._static_shapes:
            p_used = p
        if p_used < p:
            positions = positions[:, :p_used]
            gt_ids = gt_ids[:, :p_used]
            weights = weights[:, :p_used]
            valid = valid[:, :p_used]
            batch = dict(batch)
            batch["masked_lm_positions"] = positions
            batch["masked_lm_ids"] = gt_ids
            batch["masked_lm_weights"] = weights
            p = p_used

        if not valid.any() and not self._static_shapes:
            # multi-host (static) runs may NOT early-return on a locally
            # empty batch: peers would enter the global computation and
            # hang — proceed with all-invalid rows (ranks come back 0)
            return np.empty(0, dtype=np.int64)

        if self.full_ranking:
            return self._evaluate_batch_full(model, params, batch,
                                             labels, gt_ids, valid,
                                             fetch=fetch)

        if (self._device_sampling_available()
                and hasattr(model, "score_candidates")):
            return self._evaluate_batch_device(model, params, batch,
                                               labels, gt_ids, valid,
                                               fetch=fetch)

        # exclusion set per masked position: the sequence's labels + gt
        # (reference :90-95; gt is itself a label so the set is per-sequence)
        # — kept as int arrays so the sampler's vectorized scatter applies
        seq_without = [labels[i][labels[i] != 0] for i in range(b)]
        rows, cols = np.nonzero(valid)
        without_lists = [
            np.concatenate([seq_without[i], gt_ids[i, j:j + 1]])
            for i, j in zip(rows, cols)]
        if not without_lists and not self._static_shapes:
            return np.empty(0, dtype=np.int64)

        candidates = np.zeros((b, p, self.sample_size + 1), dtype=np.int32)
        if without_lists:
            negatives = self._sample_negatives(without_lists,
                                               len(without_lists))
            candidates[rows, cols, :-1] = negatives
        candidates[..., -1] = gt_ids  # ground truth last (reference :101-104)

        feature_batch = {k: v for k, v in batch.items()
                         if k not in ("labels", "example_weights")}
        placed = self._place_on_mesh(
            {**feature_batch, "candidates": jnp.asarray(candidates)})
        candidates = placed.pop("candidates")
        ranks = self._rank_fn(model)(params, placed, candidates)
        if not fetch:
            return ranks  # device array; caller fetches + filters > 0
        ranks = np.asarray(ranks)
        return ranks[ranks > 0]  # global batch in multi-host runs

    def evaluate(self, model, params=None, test_ds=None,
                 batch_size: int = 256, seed: int = 0,
                 progress_bar: bool = True) -> dict:
        """Evaluate over a ProcessedDataset (or an iterable of feature
        batches). ``model`` may be a BERT4RecModelWrapper (params taken from
        it, reference evaluate signature parity).

        ``seed`` here seeds only the dataset's dynamic masking; the
        NEGATIVE draws are governed by the constructor's ``seed`` — pass
        ``BERT4RecEvaluator(..., seed=N)`` for run-to-run-identical
        negatives (unseeded evaluators draw fresh OS entropy per run,
        mirroring the host sampler's ``default_rng(None)``)."""
        if params is None and hasattr(model, "params"):
            model, params = model.model, model.params
        self._prepare_sampler()
        self._batch_counter = 0  # deterministic device-sampling streams
        if self.seed is None:
            # unseeded evaluator: fresh negatives each run (a cached key
            # plus the counter reset would replay identical samples)
            self._base_key = None

        if hasattr(test_ds, "batches"):
            # a mesh needs device-divisible batches: zero-pad the final one
            # (padded rows carry weight 0 and never reach the metrics);
            # host masking of batch k+1 overlaps batch k's scoring
            from bert4rec_tpu.utils.prefetch import prefetch
            batches = prefetch(
                test_ds.batches(batch_size, shuffle=False, seed=seed,
                                pad_final_batch=self.mesh is not None),
                depth=2)
        else:
            batches = test_ds
        iterator = batches
        if progress_bar:
            try:
                import tqdm
                iterator = tqdm.tqdm(batches, desc="evaluating")
            except ImportError:
                pass

        # fetches on worker threads (utils.prefetch.fetch_pipelined): the
        # loop thread only preps + dispatches — deterministic dispatch
        # order, multi-host safe — so a fetch round trip (dominant on
        # high-latency links: ~28 ms on the tunneled v5e, where the jitted
        # eval is 8.6 ms) overlaps the next batches' compute. Metric
        # updates stay on this thread, in dispatch order.
        from bert4rec_tpu.utils.prefetch import fetch_pipelined
        ranks_iter = fetch_pipelined(
            iterator,
            dispatch=lambda batch: self.evaluate_batch(
                model, params, batch, fetch=False),
            fetch=np.asarray,
            workers=self.fetch_workers)
        for ranks in ranks_iter:
            self._update_metrics(ranks)
        return self.get_metrics_results()

    def _update_metrics(self, ranks) -> None:
        ranks = np.asarray(ranks)
        if ranks.ndim > 1:
            ranks = ranks[ranks > 0]
        for metric in self._metrics:
            metric.update_batch(ranks)
