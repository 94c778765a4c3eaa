"""Ranker inference app (reference ``bert4rec/apps/ranker.py:7-76``).

Ranks a target item for a raw history, within the full vocab or a candidate
subset; returns the 1-based rank plus a human-readable string.

NOTE: the reference *negates* the MLM logits before ranking (ranker.py:29),
inconsistent with its own Recommender — a documented quirk (SURVEY.md §7)
we do NOT replicate: higher logit = better rank here, consistently.

TPU-native design: the rank is computed ON DEVICE as a count of
tying-or-greater logits (ties count AGAINST the target — the same tie law
as the evaluator's rank counting and ``gt_ranks_full_vocab``, so app ranks
and eval metrics agree on tied scores) — a plain reduction that GSPMD
turns into shard-local sums + one psum on a vocab-sharded table, so the
full ``[V]`` logits row is never gathered to the host (SURVEY.md §7 hard
part 3).
"""

import functools
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.models.components.networks import Bert4RecEncoder


def _mask_vocab_padding(logits: jnp.ndarray, config) -> jnp.ndarray:
    """Knock out vocab-padding rows in tied-matmul fallback scores.

    ``mlm_logits`` masks the ``vocab_pad_to`` rows itself; the raw
    ``hidden @ table^T`` fallback must do the same or randomly-initialized
    padding embeddings pollute ranks/recommendations."""
    if config.padded_vocab_size > config.vocab_size:
        col = jnp.arange(config.padded_vocab_size)
        logits = jnp.where(col >= config.vocab_size, -1e9, logits)
    return logits


class Ranker:

    def __init__(self, model, params, dataloader):
        self.model = model
        self.params = params
        self.dataloader = dataloader

        def logits_row(params, inputs, use_mlm_head):
            """Masked-position logits ``[V]`` (device-resident, possibly
            vocab-sharded)."""
            out = model.apply(params, inputs)
            if use_mlm_head and "mlm_logits" in out:
                return out["mlm_logits"][0, 0]
            # tied-matmul fallback (reference ranker.py:38-54)
            pos = inputs["masked_lm_positions"][0, 0]
            hidden = jnp.take(out["sequence_output"][0], pos, axis=0)
            table = Bert4RecEncoder.get_embedding_table(params["encoder"])
            logits = jnp.einsum("h,vh->v", hidden.astype(jnp.float32),
                                table.astype(jnp.float32))
            return _mask_vocab_padding(logits, model.config)

        @functools.partial(jax.jit, static_argnums=(3,))
        def rank_one(params, inputs, item_id, use_mlm_head):
            logits = logits_row(params, inputs, use_mlm_head)
            target = jnp.take(logits, item_id)
            # >= includes the target itself once, giving exactly
            # 1 + (competitors tying or beating it) — the evaluator's law
            return jnp.sum((logits >= target).astype(jnp.int32))

        @functools.partial(jax.jit, static_argnums=(3,))
        def candidate_order(params, inputs, candidate_ids, use_mlm_head):
            logits = logits_row(params, inputs, use_mlm_head)
            return jnp.argsort(-jnp.take(logits, candidate_ids))

        self._rank_one = rank_one
        self._candidate_order = candidate_order

    def _inputs(self, sequence: List[str]) -> dict:
        model_input = self.dataloader.prepare_inference(list(sequence))
        return {k: jnp.asarray(v) for k, v in model_input.items()}

    def __call__(self, sequence: List[str],
                 rank_item: Optional[str] = None,
                 rank_items: Optional[List[str]] = None,
                 use_mlm_head: bool = True) -> Union[tuple, list]:
        """Rank ``rank_item`` (or each of ``rank_items``) for the history.

        :returns: ``(rank, text)`` for a single item, else a list of
            ``(item, rank)`` pairs ordered by rank.
        """
        if rank_item is None and rank_items is None:
            raise ValueError("Provide rank_item or rank_items to rank.")
        inputs = self._inputs(sequence)
        tok = self.dataloader.tokenizer

        if rank_items is not None:
            candidate_ids = jnp.asarray(tok.tokenize(list(rank_items)),
                                        dtype=jnp.int32)
            order = np.asarray(self._candidate_order(
                self.params, inputs, candidate_ids, use_mlm_head))
            return [(rank_items[i], int(r) + 1)
                    for r, i in zip(range(len(order)), order)]

        item_id = jnp.asarray(int(tok.tokenize(rank_item)), jnp.int32)
        # 1-based rank within the full vocab (ties count against the
        # target — the evaluator's tie law)
        rank = int(self._rank_one(self.params, inputs, item_id, use_mlm_head))
        text = (f"The item '{rank_item}' was ranked {rank} out of "
                f"{self.model.config.vocab_size} items for the given "
                f"sequence.")
        return rank, text
