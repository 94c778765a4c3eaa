"""BERT4Rec model: encoder + tied-embedding MLM head + vectorized ranking.

Native rebuild of reference ``bert4rec/models/bert4rec_model.py:27-240`` and
the ``tfm.nlp.layers.MaskedLM`` head it wraps (reference :76-81): gather the
masked positions, dense+gelu+LayerNorm transform, matmul against the tied
item-embedding table, add a per-item output bias.

TPU-native differences:
- ``rank_items`` is one jitted gather + argsort over ``[B, P, C]`` candidate
  logits instead of the reference's per-position python loops
  (reference :203-240);
- special-token ids are an explicit constructor argument instead of a
  module-import side effect (reference quirk at :24, SURVEY.md §7);
- the ``prediction_mask`` over special tokens — which the reference builds and
  then disables (:92-102) — is available behind ``apply_prediction_mask``
  (default off for parity).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from bert4rec_tpu.core.dtypes import DTypePolicy
from bert4rec_tpu.models.components import layers as L
from bert4rec_tpu.models.components.networks import Bert4RecEncoder
from bert4rec_tpu.models.config import BERT4RecConfig

# [PAD], [MASK], [UNK] — assigned ids 0/1/2 by the dataloader at init
# (bert4rec_tpu/dataloaders/bert4rec_dataloader.py; reference bert4rec_model.py:24)
SPECIAL_TOKEN_IDS = [0, 1, 2]


class BERT4RecModel:
    """Encoder + MLM head over one param pytree
    ``{"encoder": ..., "mlm": ...}``."""

    def __init__(self,
                 encoder: Bert4RecEncoder = None,
                 config: BERT4RecConfig = None,
                 special_token_ids: Sequence[int] = tuple(SPECIAL_TOKEN_IDS),
                 dtype_policy: Optional[DTypePolicy] = None):
        if encoder is None:
            if config is None:
                raise ValueError("Provide either an encoder or a config")
            encoder = Bert4RecEncoder(config, dtype_policy)
        self.encoder = encoder
        self.config = encoder.config
        self.dtype_policy = dtype_policy or encoder.dtype_policy
        self.special_token_ids = list(special_token_ids)

    # ------------------------------------------------------------------ #

    def init(self, rng: jax.Array) -> dict:
        cfg = self.config
        enc_rng, mlm_rng = jax.random.split(rng)
        encoder_params = self.encoder.init(enc_rng)
        mlm_params = {
            # transform back to table width for the tied matmul
            "transform": L.init_dense(mlm_rng, cfg.hidden_size,
                                      cfg.table_width,
                                      cfg.initializer_range),
            "transform_norm": L.init_layer_norm(cfg.table_width),
            "output_bias": jnp.zeros((cfg.padded_vocab_size,), jnp.float32),
        }
        return {"encoder": encoder_params, "mlm": mlm_params}

    # ------------------------------------------------------------------ #

    def mlm_logits(self, params: dict, sequence_output: jnp.ndarray,
                   masked_lm_positions: jnp.ndarray) -> jnp.ndarray:
        """Gather masked positions -> transform -> tied matmul -> [B, P, V].

        Logits are fp32 (loss/softmax stability); the matmul itself runs in
        compute dtype so a vocab-sharded table keeps its 'model'-axis layout
        and GSPMD turns this into column-parallel logits + no gather of the
        full table.
        """
        compute_dtype = self.dtype_policy.compute_dtype
        x = self.mlm_transform(params, sequence_output, masked_lm_positions)
        emb = params["encoder"]["item_embeddings"]
        if "embedding_q" in emb:
            # int8 weights-only table (models/quantization.py): matmul the
            # raw int8 codes, then scale per column — exact per-row-scale
            # dequantization without ever materializing a dense [V, W].
            # The barrier keeps compile-time constant folding (jax.export
            # embeds weights as constants) from baking a dense fp32 copy
            # of the converted table into the artifact.
            q = jax.lax.optimization_barrier(emb["embedding_q"])
            logits = jnp.einsum("bpw,vw->bpv", x, q.astype(compute_dtype),
                                preferred_element_type=jnp.float32)
            logits = logits * emb["embedding_scale"]
        else:
            table = Bert4RecEncoder.get_embedding_table(params["encoder"])
            logits = jnp.einsum("bpw,vw->bpv", x,
                                table.astype(compute_dtype),
                                preferred_element_type=jnp.float32)
        logits = logits + params["mlm"]["output_bias"]
        if self.config.padded_vocab_size > self.config.vocab_size:
            # vocab-padding ids (rows added for 'model'-axis divisibility)
            # must never win a ranking or soak up softmax mass
            col = jnp.arange(self.config.padded_vocab_size)
            logits = jnp.where(col >= self.config.vocab_size, -1e9, logits)
        return logits

    def mlm_transform(self, params: dict, sequence_output: jnp.ndarray,
                      masked_lm_positions: jnp.ndarray) -> jnp.ndarray:
        """Gather masked positions and apply the MLM transform -> [B, P, W]
        (everything of the head except the tied-table matmul)."""
        compute_dtype = self.dtype_policy.compute_dtype
        x = jnp.take_along_axis(
            sequence_output, masked_lm_positions[..., None].astype(jnp.int32),
            axis=1)
        x = L.dense(params["mlm"]["transform"], x, compute_dtype)
        x = L.get_activation(self.config.inner_activation)(x)
        return L.layer_norm(params["mlm"]["transform_norm"], x)

    def _mlm_hidden_and_table(self, params: dict, inputs: dict, *,
                              training: bool = False,
                              rng: Optional[jax.Array] = None,
                              dense_table: bool = True) -> tuple:
        """Shared front half of every head-fused path: encoder forward +
        MLM transform of the masked positions + the tied table
        (``dense_table=False`` skips building it — quantized fast paths
        read the raw quantized leaves instead)."""
        enc = self.encoder.apply(
            params["encoder"], inputs["input_word_ids"],
            inputs["input_mask"], training=training, rng=rng,
            input_timestamps=inputs.get("input_timestamps"))
        hidden = self.mlm_transform(params, enc["sequence_output"],
                                    inputs["masked_lm_positions"])
        table = (Bert4RecEncoder.get_embedding_table(params["encoder"])
                 if dense_table else None)
        return hidden, table

    def score_candidates(self, params: dict, inputs: dict,
                         candidates: jnp.ndarray,
                         mesh=None) -> jnp.ndarray:
        """Candidate-only MLM logits ``[B, P, C]`` — never materializes the
        ``[B, P, V]`` full-vocab logits (the eval hot path; see
        ops/candidate_scoring.py).

        ``mesh``: pass the mesh when the table is vocab-sharded over its
        'model' axis — the candidate gather then runs shard-local under
        shard_map instead of GSPMD all-gathering the full table."""
        from bert4rec_tpu.ops import candidate_scoring
        emb = params["encoder"]["item_embeddings"]
        if "embedding_q" in emb and mesh is None:
            # quantized serving: dequantize only the gathered candidate rows
            hidden, _ = self._mlm_hidden_and_table(
                params, inputs, dense_table=False)
            return candidate_scoring.score_candidates_quantized(
                hidden, emb, params["mlm"]["output_bias"], candidates)
        hidden, table = self._mlm_hidden_and_table(params, inputs)
        if mesh is not None:
            from bert4rec_tpu.core.mesh import MODEL_AXIS
            if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
                return candidate_scoring.score_candidates_sharded(
                    hidden, table, params["mlm"]["output_bias"], candidates,
                    mesh)
        return candidate_scoring.score_candidates(
            hidden, table, params["mlm"]["output_bias"], candidates)

    def loss_and_metrics(self, params: dict, inputs: dict, *,
                         training: bool = False,
                         rng: Optional[jax.Array] = None,
                         mesh=None) -> tuple:
        """(masked-SCCE loss, {masked_accuracy, accuracy}) for a train/eval
        step. With ``config.use_fused_loss`` the tied softmax + loss +
        metrics run as one Pallas kernel (no [B, P, V] logits in HBM);
        otherwise identical math via the standard logits path.

        ``mesh``: pass the trainer's mesh when the table is vocab-sharded
        over its 'model' axis — the loss then runs the shard_map'd
        cross-shard kernels (ops/sharded_mlm_loss.py) instead of letting
        GSPMD materialize per-shard logits slabs."""
        from bert4rec_tpu.trainers import trainer_utils
        labels = inputs["masked_lm_ids"]

        if (mesh is not None and self.config.use_fused_loss):
            from bert4rec_tpu.core.mesh import MODEL_AXIS
            mp = dict(mesh.shape).get(MODEL_AXIS, 1)
            if mp > 1 and self.config.padded_vocab_size % mp == 0:
                from bert4rec_tpu.ops.sharded_mlm_loss import (
                    sharded_mlm_loss_and_metrics,
                )
                hidden, table = self._mlm_hidden_and_table(
                    params, inputs, training=training, rng=rng)
                return sharded_mlm_loss_and_metrics(
                    hidden, table, params["mlm"]["output_bias"], labels,
                    self.config.vocab_size, mesh)

        use_fused = self.config.use_fused_loss
        if use_fused:
            # applicability guard: small vocabs use the whole-table-in-VMEM
            # kernel, larger ones the vocab-tiled flash-softmax kernels;
            # only a table too big for even the tiled path (or sharded use
            # cases preferring GSPMD) falls back to the XLA logits path
            from bert4rec_tpu.ops.fused_mlm_loss import fused_loss_available
            use_fused = fused_loss_available(self.config.padded_vocab_size,
                                             self.config.table_width)
        if use_fused:
            from bert4rec_tpu.ops.fused_mlm_loss import mlm_loss_and_metrics
            hidden, table = self._mlm_hidden_and_table(
                params, inputs, training=training, rng=rng)
            return mlm_loss_and_metrics(
                hidden, table, params["mlm"]["output_bias"], labels,
                self.config.vocab_size)
        out = self.apply(params, inputs, training=training, rng=rng)
        logits = out["mlm_logits"]
        loss = trainer_utils.masked_sparse_categorical_crossentropy(
            labels, logits)
        logs = {
            "masked_accuracy": trainer_utils.masked_accuracy(labels, logits),
            "accuracy": trainer_utils.sparse_categorical_accuracy(labels,
                                                                  logits),
        }
        return loss, logs

    def apply(self, params: dict, inputs: dict, *,
              training: bool = False,
              rng: Optional[jax.Array] = None,
              apply_prediction_mask: bool = False,
              output_range: Optional[int] = None) -> dict:
        """Forward pass over the reference feature dict.

        ``mlm_logits`` is produced iff ``masked_lm_positions`` is present
        (reference bert4rec_model.py:110-149).
        """
        outputs = dict(self.encoder.apply(
            params["encoder"],
            inputs["input_word_ids"], inputs["input_mask"],
            training=training, rng=rng, output_range=output_range,
            input_timestamps=inputs.get("input_timestamps")))

        if "masked_lm_positions" in inputs:
            logits = self.mlm_logits(params, outputs["sequence_output"],
                                     inputs["masked_lm_positions"])
            if apply_prediction_mask and self.special_token_ids:
                # width must match the logits (padded_vocab_size when
                # vocab_pad_to pads the table for 'model'-axis sharding)
                mask = jnp.zeros((self.config.padded_vocab_size,),
                                 jnp.float32) \
                    .at[jnp.asarray(self.special_token_ids)].set(-1e9)
                logits = logits + mask
            outputs["mlm_logits"] = logits
        return outputs

    __call__ = apply

    # ------------------------------------------------------------------ #
    # ranking (reference rank_items, bert4rec_model.py:203-240 — vectorized)
    # ------------------------------------------------------------------ #

    def rank_with_candidates(self, params: dict, inputs: dict,
                             candidates: jnp.ndarray, *,
                             with_probabilities: bool = True) -> tuple:
        """Rank per-position candidate item lists.

        :param candidates: ``[B, P, C]`` int ids per masked position
        :returns: ``(rankings [B, P, C] ids ordered best-first,
                     probabilities [B, P, V] softmax over the full vocab —
                     None when ``with_probabilities=False``)``
        """
        outputs = self.apply(params, inputs)
        logits = outputs["mlm_logits"]  # [B, P, V]
        probabilities = (jax.nn.softmax(logits, axis=-1)
                         if with_probabilities else None)
        cand_logits = jnp.take_along_axis(logits, candidates, axis=-1)
        order = jnp.argsort(-cand_logits, axis=-1)
        rankings = jnp.take_along_axis(candidates, order, axis=-1)
        return rankings, probabilities

    def rank_full_vocab(self, params: dict, inputs: dict, *,
                        with_probabilities: bool = True) -> tuple:
        """Rank the entire vocabulary per masked position:
        ``rankings [B, P, V]`` best-first (+ softmax probabilities, or None
        when ``with_probabilities=False`` — callers that only need rankings
        skip a [B, P, V] exp/normalize pass).

        For top-k-only consumers on a vocab-sharded table use
        :meth:`rank_top_k`, which never gathers the full logits."""
        outputs = self.apply(params, inputs)
        logits = outputs["mlm_logits"]
        probabilities = (jax.nn.softmax(logits, axis=-1)
                         if with_probabilities else None)
        rankings = jnp.argsort(-logits, axis=-1)
        return rankings, probabilities

    def rank_top_k(self, params: dict, inputs: dict, k: int, *,
                   mesh=None,
                   exclude: Optional[jnp.ndarray] = None,
                   with_probabilities: bool = False) -> tuple:
        """Top-k full-vocab ranking without replicating ``[B, P, V]``.

        Per-vocab-shard ``lax.top_k`` + merge (ops/sharded_topk.py) — the
        sharded-table answer to the reference's full-vocab ``rank_items``
        (reference bert4rec_model.py:203-240; SURVEY.md §7 hard part 3).

        :param mesh: the 'model'-sharded mesh the params live on (aligns the
            shard-local pass with the table's shards); None is correct too
        :param exclude: optional ``[B, E]`` int ids (< 0 = padding) excluded
            per batch row across all positions (seen items, special tokens)
        :param with_probabilities: also return softmax probabilities of the
            top-k items (one logsumexp over V — no full softmax tensor)
        :returns: ``(top_ids [B, P, k], top_scores [B, P, k])`` — scores are
            logits, or probabilities with ``with_probabilities``
        """
        from bert4rec_tpu.ops import sharded_topk
        outputs = self.apply(params, inputs)
        logits = outputs["mlm_logits"]                      # [B, P, V]
        if exclude is not None:
            bias = sharded_topk.exclusion_bias(
                jnp.asarray(exclude), logits.shape[-1])
            logits = logits + bias[:, None, :]
        values, ids = sharded_topk.topk_over_vocab(logits, k, mesh=mesh)
        if with_probabilities:
            lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            return ids, jnp.exp(values - lse)
        return ids, values

    # vocab width above which gt_ranks_full_vocab streams the table in
    # tiles instead of materializing [B, P, V] fp32 logits (the dense
    # tensor is ~1.1 GB at ML-20M width — fine transiently — but 13.7 GB
    # at the Reddit catalog's 335k items, which cannot exist on one chip)
    TILED_RANK_VOCAB_THRESHOLD = 65536

    def gt_ranks_full_vocab(self, params: dict, inputs: dict, *,
                            exclude: Optional[jnp.ndarray] = None,
                            vocab_tile: Optional[int] = None
                            ) -> jnp.ndarray:
        """1-based rank of each masked position's ground truth against the
        ENTIRE catalog — the unsampled evaluation protocol.

        Sampled metrics (the reference's 101-candidate protocol,
        reference bert4rec/evaluation/bert4rec_evaluator.py:90-120) are
        biased estimators of the true ranking metrics (Krichene & Rendle,
        KDD 2020); this is the exact counterpart: rank = 1 + the number of
        non-excluded catalog items whose logit ties or beats the ground
        truth's (ties ahead of the GT, consistent with the sampled path).
        The ground-truth column itself never self-counts.

        One [B, P, V] comparison + reduction — no argsort, no top-k cutoff;
        on a vocab-sharded table GSPMD keeps the logits column-parallel and
        reduces the count with one psum. Above
        ``TILED_RANK_VOCAB_THRESHOLD`` (or with an explicit
        ``vocab_tile``) the same law runs as a ``lax.scan`` over vocab
        tiles (ops/candidate_scoring.py ``gt_ranks_tiled``) so the full
        logits tensor never exists.

        :param exclude: optional ``[B, E]`` int ids (< 0 = padding) removed
            from the competitor set per batch row (seen items / specials)
        :param vocab_tile: force the tiled path with this tile width
        :returns: ``[B, P]`` int32 ranks (>= 1)
        """
        gt_ids = inputs["masked_lm_ids"].astype(jnp.int32)
        use_tiled = (vocab_tile is not None
                     or self.config.padded_vocab_size
                     > self.TILED_RANK_VOCAB_THRESHOLD)
        if use_tiled:
            # an int8 table is fine here: _mlm_hidden_and_table builds
            # the dequantized [V, W] table (171 MB fp32 at 335k — cheap;
            # the 13.7 GB problem this path exists for is the LOGITS
            # tensor, which stays tiled either way)
            from bert4rec_tpu.ops import candidate_scoring
            hidden, table = self._mlm_hidden_and_table(params, inputs)
            return candidate_scoring.gt_ranks_tiled(
                hidden, table, params["mlm"]["output_bias"], gt_ids,
                vocab_size=self.config.vocab_size, exclude=exclude,
                tile=vocab_tile or 8192)
        out = self.apply(params, inputs)
        logits = out["mlm_logits"]                           # [B, P, V] fp32
        gt = jnp.take_along_axis(logits, gt_ids[..., None], axis=-1)
        if exclude is not None:
            from bert4rec_tpu.ops import sharded_topk
            bias = sharded_topk.exclusion_bias(
                jnp.asarray(exclude), logits.shape[-1])
            logits = logits + bias[:, None, :]
        b, p = gt_ids.shape
        logits = logits.at[jnp.arange(b)[:, None],
                           jnp.arange(p)[None, :], gt_ids].set(-1e9)
        beaten = jnp.sum((logits >= gt).astype(jnp.int32), axis=-1)
        return beaten + 1

    def rank_items(self, params: dict, encoder_input: dict,
                   rank_items_list: Optional[jnp.ndarray] = None) -> tuple:
        """Reference-signature convenience (bert4rec_model.py:203).

        ``rank_items_list`` is ``[B, P, C]`` (or None for full vocab).
        """
        if rank_items_list is None:
            return self.rank_full_vocab(params, encoder_input)
        return self.rank_with_candidates(params, encoder_input,
                                         jnp.asarray(rank_items_list))

    # ------------------------------------------------------------------ #

    def get_config(self) -> dict:
        return self.config.to_dict()

    @classmethod
    def from_config(cls, config: dict, **kwargs) -> "BERT4RecModel":
        return cls(config=BERT4RecConfig.from_dict(config), **kwargs)
