"""Recommender inference app (reference ``bert4rec/apps/recommender.py:6-63``).

Given a raw item-string history: ``prepare_inference`` (append ``[UNK]``,
last-token mask) -> jitted forward -> MLM logits of the masked position ->
-inf mask over already-seen items (reference :17-30) -> argmax -> detokenize.

The tied-embedding matmul fallback (reference :38-54, used when a model has
no MLM head) is ``use_mlm_head=False``: scores = sequence_output @ table^T.
"""

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.models.components.networks import Bert4RecEncoder


def build_exclusion_rows(sequences, tokenizer, special_token_ids,
                         width: Optional[int] = None) -> np.ndarray:
    """``[B, W]`` int32 exclusion rows: each history's seen item ids + the
    special ids, padded with -1 (the exclusion-bias pad value).

    ``width=None`` pads W to a power of two (>= 8) so one compiled kernel
    serves many request shapes; a fixed ``width`` (AOT artifacts) raises
    when a row cannot fit."""
    seen_lists = [np.asarray(tokenizer.tokenize(list(s)), dtype=np.int32)
                  for s in sequences]
    specials = np.asarray(list(special_token_ids), np.int32)
    longest = max((len(s) for s in seen_lists), default=0) + len(specials)
    if width is None:
        width = max(8, 1 << (max(longest, 1) - 1).bit_length())
    elif longest > width:
        raise ValueError(
            f"a history of {longest - len(specials)} items (+"
            f"{len(specials)} specials) exceeds the exclusion width "
            f"{width}; re-export with a larger num_exclude")
    rows = np.full((len(sequences), width), -1, dtype=np.int32)
    for i, seen in enumerate(seen_lists):
        row = np.concatenate([seen, specials])
        rows[i, :len(row)] = row
    return rows


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
        ids = self._dispatch_topk(sequences, top_k)
        return self._decode_topk(ids)

    def _dispatch_topk(self, sequences, top_k: int):
        """Prep + dispatch one request batch; returns the DEVICE ids array
        (no host sync — callers fetch, enabling pipelined serving)."""
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

        exclude = build_exclusion_rows(sequences, tok,
                                       self.model.special_token_ids)
        ids, _ = self._topk_fn(self.params, batch, jnp.asarray(exclude),
                               int(top_k))
        return ids

    def _decode_topk(self, ids, k: Optional[int] = None) -> list:
        tok = self.dataloader.tokenizer
        rows = np.asarray(ids)
        if k is not None:
            rows = rows[:, :k]
        return [[tok.detokenize(int(t)) for t in row] for row in rows]

    def recommend_stream(self, batches, top_k: int = 1,
                         fetch_workers: int = 2):
        """Pipelined :meth:`recommend_batch` over an ITERABLE of history
        batches — yields one result list per input batch, in order.

        On high-latency links the per-batch cost of ``recommend_batch`` is
        dominated by the device->host fetch round trip, not the scoring;
        this generator dispatches batch k+1 while batch k's ids are being
        fetched on a worker thread (``utils.prefetch.fetch_pipelined``,
        same discipline as the evaluator's ``fetch_workers``). Results
        are identical to calling ``recommend_batch`` per batch.
        """
        from bert4rec_tpu.utils.prefetch import fetch_pipelined
        yield from fetch_pipelined(
            batches,
            dispatch=lambda seqs: self._dispatch_topk(seqs, top_k),
            fetch=lambda ids: self._decode_topk(np.asarray(ids)),
            workers=fetch_workers)


class ArtifactRecommender:
    """``recommend_batch`` over a weights-embedded AOT serving artifact.

    The live :class:`Recommender` needs the model code and a params
    pytree; this needs only a deserialized
    ``models.export.export_top_k(..., num_exclude=E)`` artifact plus a
    dataloader (tokenizer + inference preprocessing) — the deployment
    shape where the serving process ships no model code. Drop-in backend
    for :class:`~bert4rec_tpu.apps.serving.RecommenderService`.

    ``k`` and the exclusion width are read off the artifact's signature;
    the artifact must have been exported WITH ``num_exclude`` (otherwise
    seen items could be recommended back).
    """

    def __init__(self, artifact, dataloader,
                 special_token_ids=(0, 1, 2)):
        if len(artifact.in_avals) != 4:
            raise ValueError(
                "the artifact must be exported with num_exclude=E "
                "(export_top_k(..., num_exclude=...)) so seen items can "
                f"be excluded; got {len(artifact.in_avals)} inputs")
        self.artifact = artifact
        self.dataloader = dataloader
        self.special_token_ids = list(special_token_ids)
        # introspected from the artifact signature; public so a serving
        # layer can validate requests BEFORE they reach a shared batch
        self.exclusion_width = int(artifact.in_avals[3].shape[1])
        self.exported_k = int(artifact.out_avals[0].shape[-1])

    @property
    def max_history_items(self) -> int:
        """Longest history this artifact can exclude."""
        return self.exclusion_width - len(self.special_token_ids)

    def recommend_batch(self, sequences, top_k: Optional[int] = None):
        """Top-k next-item recommendations, ranked by the artifact.

        :param top_k: <= the exported k (defaults to it)
        """
        k = self.exported_k if top_k is None else int(top_k)
        ids = self._dispatch_topk(sequences, k)
        # decode only the requested k of the artifact's exported_k columns
        return self._decode_topk(ids, k)

    def _dispatch_topk(self, sequences, top_k: Optional[int]):
        """Prep + dispatch through the artifact; returns the DEVICE ids
        (no host sync). ``top_k`` only validates — the artifact always
        ranks its exported k; callers slice."""
        k = self.exported_k if top_k is None else int(top_k)
        if k > self.exported_k:
            raise ValueError(f"top_k={k} exceeds the artifact's exported "
                             f"k={self.exported_k}")
        feats = self.dataloader.prepare_inference_batch(
            [list(s) for s in sequences])
        exclude = build_exclusion_rows(sequences,
                                       self.dataloader.tokenizer,
                                       self.special_token_ids,
                                       width=self.exclusion_width)
        ids, _ = self.artifact.call(
            np.asarray(feats["input_word_ids"], np.int32),
            np.asarray(feats["input_mask"], np.int32),
            np.asarray(feats["masked_lm_positions"], np.int32),
            exclude)
        return ids

    def _decode_topk(self, ids, k: Optional[int] = None) -> list:
        # the single masked position is slot 0 (last-token mask)
        tok = self.dataloader.tokenizer
        rows = np.asarray(ids)[:, 0]
        if k is not None:
            rows = rows[:, :k]
        return [[tok.detokenize(int(t)) for t in row] for row in rows]
