"""Recommender inference app (reference ``bert4rec/apps/recommender.py:6-63``).

Given a raw item-string history: ``prepare_inference`` (append ``[UNK]``,
last-token mask) -> jitted forward -> MLM logits of the masked position ->
-inf mask over already-seen items (reference :17-30) -> argmax -> detokenize.

The tied-embedding matmul fallback (reference :38-54, used when a model has
no MLM head) is ``use_mlm_head=False``: scores = sequence_output @ table^T.
"""

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.models.components.networks import Bert4RecEncoder


class Recommender:

    def __init__(self, model, params, dataloader, mesh=None):
        self.model = model
        self.params = params
        self.dataloader = dataloader
        self.mesh = mesh
        self._forward = jax.jit(
            lambda params, inputs: model.apply(params, inputs))

        @functools.partial(jax.jit, static_argnums=(3,))
        def topk_fn(params, inputs, exclude, k):
            ids, scores = model.rank_top_k(
                params, inputs, k, mesh=self.mesh, exclude=exclude)
            return ids[:, 0], scores[:, 0]

        self._topk_fn = topk_fn

    def __call__(self, sequence: List[str],
                 use_mlm_head: bool = True) -> str:
        """Recommend the next item for a raw item-string history."""
        model_input = self.dataloader.prepare_inference(list(sequence))
        seen_ids = np.asarray(
            self.dataloader.tokenizer.tokenize(list(sequence)), dtype=np.int32)

        inputs = {k: jnp.asarray(v) for k, v in model_input.items()}
        outputs = self._forward(self.params, inputs)

        if use_mlm_head and "mlm_logits" in outputs:
            # the single masked position is slot 0 (last-token mask)
            logits = outputs["mlm_logits"][0, 0]
        else:
            # tied-embedding fallback on the masked position's hidden state
            from bert4rec_tpu.apps.ranker import _mask_vocab_padding
            pos = int(np.asarray(model_input["masked_lm_positions"])[0, 0])
            hidden = outputs["sequence_output"][0, pos]
            table = Bert4RecEncoder.get_embedding_table(
                self.params["encoder"])
            logits = jnp.einsum("h,vh->v", hidden.astype(jnp.float32),
                                table.astype(jnp.float32))
            logits = _mask_vocab_padding(logits, self.model.config)

        vocab_size = logits.shape[-1]
        mask = np.zeros(vocab_size, dtype=np.float32)
        mask[seen_ids[seen_ids < vocab_size]] = -np.inf
        # special tokens are never recommendations
        for sid in self.model.special_token_ids:
            mask[sid] = -np.inf

        best = int(jnp.argmax(logits + jnp.asarray(mask)))
        return self.dataloader.tokenizer.detokenize(best)

    # ------------------------------------------------------------------ #
    # batched serving (no reference counterpart: the reference recommends
    # one history per python call; this scores a whole request batch in
    # one jitted forward + top-k)
    # ------------------------------------------------------------------ #

    def recommend_batch(self, sequences, top_k: int = 1):
        """Top-k next-item recommendations for many histories at once.

        :param sequences: list of raw item-string histories
        :param top_k: recommendations per history
        :returns: list (per history) of lists of item strings, best first;
            already-seen items and special tokens are excluded.

        The scoring runs entirely on device through
        :meth:`BERT4RecModel.rank_top_k` (shard-local top-k + merge): the
        ``[B, V]`` logits never reach the host, and on a vocab-sharded
        table they are never even gathered across shards.
        """
        tok = self.dataloader.tokenizer
        wanted = ("input_word_ids", "input_mask", "masked_lm_positions")
        if hasattr(self.dataloader, "prepare_inference_batch"):
            feats = self.dataloader.prepare_inference_batch(
                [list(s) for s in sequences])
            batch = {k: jnp.asarray(feats[k]) for k in wanted}
        else:  # duck-typed dataloaders: per-history fallback
            per_seq = [self.dataloader.prepare_inference(list(s))
                       for s in sequences]
            batch = {k: jnp.asarray(np.concatenate([d[k] for d in per_seq]))
                     for k in wanted}

        specials = list(self.model.special_token_ids)
        seen_lists = [np.asarray(tok.tokenize(list(s)), dtype=np.int32)
                      for s in sequences]
        width = max(len(s) for s in seen_lists) + len(specials)
        # pad the exclusion width to a power of two: one compiled kernel
        # serves many request shapes
        width = max(8, 1 << (width - 1).bit_length())
        exclude = np.full((len(sequences), width), -1, dtype=np.int32)
        for i, seen in enumerate(seen_lists):
            row = np.concatenate([seen, np.asarray(specials, np.int32)])
            exclude[i, :len(row)] = row

        ids, _ = self._topk_fn(self.params, batch, jnp.asarray(exclude),
                               int(top_k))
        return [[tok.detokenize(int(t)) for t in row]
                for row in np.asarray(ids)]
