"""Ranker inference app (reference ``bert4rec/apps/ranker.py:7-76``).

Ranks a target item for a raw history, within the full vocab or a candidate
subset; returns the 1-based rank plus a human-readable string.

NOTE: the reference *negates* the MLM logits before ranking (ranker.py:29),
inconsistent with its own Recommender — a documented quirk (SURVEY.md §7)
we do NOT replicate: higher logit = better rank here, consistently.
"""

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.models.components.networks import Bert4RecEncoder


class Ranker:

    def __init__(self, model, params, dataloader):
        self.model = model
        self.params = params
        self.dataloader = dataloader
        self._forward = jax.jit(
            lambda params, inputs: model.apply(params, inputs))

    def _logits(self, sequence: List[str], use_mlm_head: bool) -> np.ndarray:
        model_input = self.dataloader.prepare_inference(list(sequence))
        inputs = {k: jnp.asarray(v) for k, v in model_input.items()}
        outputs = self._forward(self.params, inputs)
        if use_mlm_head and "mlm_logits" in outputs:
            return np.asarray(outputs["mlm_logits"][0, 0])
        pos = int(np.asarray(model_input["masked_lm_positions"])[0, 0])
        hidden = outputs["sequence_output"][0, pos]
        table = Bert4RecEncoder.get_embedding_table(self.params["encoder"])
        return np.asarray(jnp.einsum("h,vh->v", hidden.astype(jnp.float32),
                                     table.astype(jnp.float32)))

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
        logits = self._logits(sequence, use_mlm_head)

        tok = self.dataloader.tokenizer
        if rank_items is not None:
            candidate_ids = np.asarray(tok.tokenize(list(rank_items)),
                                       dtype=np.int64)
            cand_logits = logits[candidate_ids]
            order = np.argsort(-cand_logits)
            return [(rank_items[i], int(r) + 1)
                    for r, i in zip(range(len(order)), order)]

        item_id = int(tok.tokenize(rank_item))
        # 1-based rank within the full vocab (ties rank ahead, stable)
        rank = int((logits > logits[item_id]).sum()) + 1
        text = (f"The item '{rank_item}' was ranked {rank} out of "
                f"{logits.shape[-1]} items for the given sequence.")
        return rank, text
