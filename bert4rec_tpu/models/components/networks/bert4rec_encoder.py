"""Bidirectional transformer encoder — native rebuild of the reference
``Bert4RecEncoder`` (reference
bert4rec/models/components/networks/bert4rec_encoder.py:13-263).

Composition (reference :103-231): item-embedding lookup + learned absolute
position embeddings -> add -> LayerNorm(eps 1e-12, fp32) -> dropout ->
optional factorized embedding projection (embedding_width != hidden_size,
:124-131) -> additive pad-mask attention bias (:134-135) -> N transformer
blocks (``output_range`` slicing on the last layer, :136-147) -> tanh pooler
on token 0 (:149-153). Returns ``{sequence_output, pooled_output,
encoder_outputs}`` (:228-231); ``get_embedding_table`` exposes the table for
MLM weight tying (:233-234).

TPU-native design: pure functions over a nested-dict param pytree; bf16
compute via :class:`~bert4rec_tpu.core.dtypes.DTypePolicy`; no framework
layer objects. The param *paths* (``item_embeddings/embedding`` etc.) are the
contract the sharding rules in ``core/partitioning.py`` match against.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.core.dtypes import DTypePolicy
from bert4rec_tpu.models.components import layers as L
from bert4rec_tpu.models.components.transformer import (
    init_transformer_block,
    transformer_block,
)
from bert4rec_tpu.models.config import BERT4RecConfig


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rel_lookup(n_buckets: int, table, bucket):
    """``table[bucket]`` (``[nb, n]`` by ``[B, S, S]`` -> ``[B, S, S, n]``)
    as a ONE-HOT MATMUL in both directions — the TPU-shaped lowering for
    a tiny-table gather with 10M+ indices (v5e, B=256 S=200 nb=64 n=4,
    tools/temporal_ablate.py):

      forward:  ``jnp.take``'s gather lowering measured 27.9 ms; the
                one-hot contraction 2.6 ms (XLA fuses the indicator into
                the dot operand read — it is never materialized).
      backward: the gather's scatter-add VJP serializes on colliding
                indices (segment_sum: 94 ms); 64 sibling masked
                reductions don't horizontally fuse (8.8 ms); the
                transposed one-hot contraction measures 2.1 ms.

    The custom VJP keeps only the int32 ``bucket`` as residual so the
    indicator is regenerated (fused) rather than stored (2.7 GB)."""
    oh = (bucket[..., None] == jnp.arange(n_buckets)).astype(jnp.float32)
    return jax.lax.dot_general(oh, table, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _rel_lookup_fwd(n_buckets, table, bucket):
    return _rel_lookup(n_buckets, table, bucket), bucket


def _rel_lookup_bwd(n_buckets, bucket, g):
    oh = (bucket[..., None] == jnp.arange(n_buckets)).astype(jnp.float32)
    dtable = jax.lax.dot_general(
        oh.reshape(-1, n_buckets), g.reshape(-1, g.shape[-1]),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # integer primal -> float0 cotangent
    dbucket = np.zeros(bucket.shape, dtype=jax.dtypes.float0)
    return dtable, dbucket


_rel_lookup.defvjp(_rel_lookup_fwd, _rel_lookup_bwd)


class Bert4RecEncoder:
    """Stateless module: ``init`` makes the param pytree, ``apply`` runs it."""

    def __init__(self, config: BERT4RecConfig,
                 dtype_policy: Optional[DTypePolicy] = None):
        self.config = config
        self.dtype_policy = dtype_policy or DTypePolicy.f32()

    # ------------------------------------------------------------------ #

    def init(self, rng: jax.Array) -> dict:
        cfg = self.config
        stddev = cfg.initializer_range
        n_keys = 4 + cfg.num_layers
        keys = jax.random.split(rng, n_keys)

        params = {
            "item_embeddings": L.init_embedding(
                keys[0], cfg.padded_vocab_size, cfg.table_width, stddev),
            "position_embeddings": L.init_position_embedding(
                keys[1], cfg.max_sequence_length, cfg.table_width, stddev),
            "embedding_norm": L.init_layer_norm(cfg.table_width),
            "layers": {
                f"layer_{i}": init_transformer_block(
                    keys[4 + i], cfg.hidden_size, cfg.num_attention_heads,
                    cfg.inner_dim, stddev)
                for i in range(cfg.num_layers)
            },
            "pooler": L.init_dense(keys[2], cfg.hidden_size, cfg.hidden_size,
                                   stddev),
        }
        if cfg.embedding_width is not None \
                and cfg.embedding_width != cfg.hidden_size:
            params["embedding_projection"] = L.init_dense(
                keys[3], cfg.embedding_width, cfg.hidden_size, stddev)
        if cfg.use_temporal_embeddings:
            # beyond-parity: recency-bucket embedding consuming the temporal
            # preprocessor's input_timestamps (see BERT4RecConfig)
            params["temporal_embeddings"] = L.init_embedding(
                jax.random.fold_in(keys[0], 7), cfg.temporal_buckets,
                cfg.table_width, stddev)
        if cfg.use_temporal_attention:
            # beyond-parity: per-head additive attention bias over signed
            # log2 time-delta buckets (TiSASRec-style). Zeros => enabling
            # the flag is a no-op until trained.
            params["temporal_attention_bias"] = {
                "embedding": jnp.zeros(
                    (cfg.temporal_attention_buckets, cfg.num_attention_heads),
                    jnp.float32)}
        return params

    # ------------------------------------------------------------------ #

    def apply(self, params: dict,
              input_word_ids: jnp.ndarray,
              input_mask: jnp.ndarray,
              *,
              training: bool = False,
              rng: Optional[jax.Array] = None,
              output_range: Optional[int] = None,
              input_timestamps: Optional[jnp.ndarray] = None) -> dict:
        """Forward pass.

        :param input_word_ids: ``[B, S]`` int item ids
        :param input_mask: ``[B, S]`` 1 for real tokens, 0 for padding
        :param output_range: compute only the first ``output_range`` positions
            of the final layer (reference's last-block slicing, :218-222)
        :param input_timestamps: optional ``[B, S]`` int64 epoch seconds
            (temporal preprocessor); used iff
            ``config.use_temporal_embeddings``
        :returns: dict with ``sequence_output`` ``[B, S(or R), H]``,
            ``pooled_output`` ``[B, H]``, ``encoder_outputs`` list per layer.
        """
        cfg = self.config
        compute_dtype = self.dtype_policy.compute_dtype
        act = L.get_activation(cfg.inner_activation)
        seq_len = input_word_ids.shape[1]

        n_rngs = cfg.num_layers + 1
        rngs = (jax.random.split(rng, n_rngs) if rng is not None
                else (None,) * n_rngs)

        x = L.embedding_lookup(params["item_embeddings"], input_word_ids,
                               compute_dtype)
        x = x + L.position_embedding(params["position_embeddings"], seq_len,
                                     compute_dtype)
        if "temporal_embeddings" in params:
            buckets = self._recency_buckets(input_timestamps, input_mask,
                                            cfg.temporal_buckets)
            x = x + L.embedding_lookup(params["temporal_embeddings"],
                                       buckets, compute_dtype)
        x = L.layer_norm(params["embedding_norm"], x)
        x = L.dropout(rngs[0], x, cfg.output_dropout, training)

        if "embedding_projection" in params:
            x = L.dense(params["embedding_projection"], x, compute_dtype)

        attn_bias = L.self_attention_mask(input_mask)

        causal = cfg.causal_attention
        if causal:
            # dense triangle folded into attn_bias for the plain XLA path
            # ONLY; the flash/fused kernels build it in VMEM (their causal
            # flag) and never read attn_bias, so XLA dead-code-eliminates
            # this on the kernel paths
            idx = jnp.arange(seq_len)
            tri = jnp.where(idx[None, :] <= idx[:, None], 0.0, -1e9) \
                .astype(jnp.float32)[None, None]         # [1, 1, S, S]
            attn_bias = attn_bias + tri
        temporal_attn = (cfg.use_temporal_attention
                         and "temporal_attention_bias" in params)

        # whole-layer fusion: post-LN only, no query slicing, and either a
        # real TPU or inactive dropout (interpret mode has no PRNG). A
        # temporal bias does NOT force the fallback: the dense per-head
        # bias is built once per step and STREAMED into the kernel per
        # cell (fused_encoder_layer rel_bias) — HBM traffic is cheap here;
        # it was the unfused attention around the dense bias (and later
        # the in-kernel per-bucket select rebuild) that was slow
        attn_rate = cfg.attention_dropout if training else 0.0
        out_rate = cfg.output_dropout if training else 0.0
        fused_ok = (cfg.use_fused_layer and not cfg.norm_first
                    and output_range is None
                    and cfg.inner_activation == "gelu"
                    and (jax.devices()[0].platform == "tpu"
                         or (attn_rate == 0.0 and out_rate == 0.0)))
        if fused_ok:
            # applicability guard: sequence-length cap + VMEM-fit estimate
            # (a config like the reference encoder defaults, hidden 768 /
            # S 512, silently falls back instead of dying in Mosaic)
            from bert4rec_tpu.ops.fused_encoder_layer import (
                fused_layer_supported,
            )
            fused_ok = fused_layer_supported(
                batch=input_word_ids.shape[0], seq_len=seq_len,
                hidden=cfg.hidden_size, inner_dim=cfg.inner_dim,
                num_heads=cfg.num_attention_heads,
                dtype_bytes=jnp.dtype(compute_dtype).itemsize,
                temporal=temporal_attn)

        rel_bias = None
        dense_bias = False  # a bias the flash/XLA paths must materialize
        if temporal_attn:
            rel = self._relative_time_bias(
                params["temporal_attention_bias"]["embedding"],
                input_timestamps, input_mask)                 # [B,n,S,S]
            if fused_ok:
                # streamed into the fused kernel per cell; built ONCE per
                # step (shared by every layer — XLA CSEs the lookup)
                rel_bias = rel
            else:
                attn_bias = attn_bias + rel
                dense_bias = True
        use_flash = cfg.use_flash_attention and not dense_bias

        encoder_outputs = []
        for i in range(cfg.num_layers):
            is_last = i == cfg.num_layers - 1
            if fused_ok:
                from bert4rec_tpu.ops.fused_encoder_layer import (
                    fused_encoder_layer,
                )
                layer_rng = rngs[1 + i]
                # no rng => no dropout (matches the unfused path)
                a_rate = attn_rate if layer_rng is not None else 0.0
                o_rate = out_rate if layer_rng is not None else 0.0
                seed = (jax.random.randint(layer_rng, (), 0, 2 ** 31 - 1)
                        if a_rate > 0 or o_rate > 0 else 0)
                x = fused_encoder_layer(
                    params["layers"][f"layer_{i}"], x, input_mask,
                    num_heads=cfg.num_attention_heads,
                    attention_dropout=a_rate,
                    output_dropout=o_rate,
                    seed=seed, causal=causal,
                    rel_bias=rel_bias)
            else:
                def run_block(layer_params, x_in, bias, layer_rng,
                              _qr=output_range if is_last else None):
                    return transformer_block(
                        layer_params, x_in, bias,
                        num_heads=cfg.num_attention_heads,
                        inner_activation=act,
                        output_dropout=cfg.output_dropout,
                        attention_dropout=cfg.attention_dropout,
                        rng=layer_rng,
                        training=training,
                        norm_first=cfg.norm_first,
                        compute_dtype=compute_dtype,
                        query_range=_qr,
                        use_flash=use_flash,
                        input_mask=input_mask, causal=causal)

                if cfg.remat:
                    # trade FLOPs for HBM: autodiff recomputes this layer's
                    # activations in backward instead of holding them (the
                    # fused-kernel branch above does this inherently)
                    run_block = jax.checkpoint(run_block)
                x = run_block(params["layers"][f"layer_{i}"], x, attn_bias,
                              rngs[1 + i])
            encoder_outputs.append(x)

        sequence_output = encoder_outputs[-1]
        first_token = sequence_output[:, 0]
        pooled_output = jnp.tanh(
            L.dense(params["pooler"], first_token, compute_dtype))

        return {
            "sequence_output": sequence_output,
            "pooled_output": pooled_output,
            "encoder_outputs": encoder_outputs,
        }

    # ------------------------------------------------------------------ #

    @staticmethod
    def _recency_buckets(input_timestamps, input_mask, n_buckets):
        """``[B, S]`` log2 recency buckets: 0 = newest event (or no
        timestamps at all — a learned "no signal" vector), growing with
        seconds-before-the-sequence's-latest-event. jit-safe, static
        shapes."""
        if input_timestamps is None:
            return jnp.zeros_like(input_mask, dtype=jnp.int32)
        # subtract in INTEGER time: float32 epoch seconds quantize to
        # ~128 s (ulp at 1.7e9), which would destroy the small-recency
        # buckets; only the small delta is safe to take to float. int32
        # differences are exact for seconds-resolution stamps (x64 is off
        # in jax by default, and wraparound preserves differences under
        # 2^31 s ≈ 68 years).
        ts = input_timestamps.astype(jnp.int32)
        valid = input_mask > 0
        newest = jnp.max(jnp.where(valid, ts, jnp.iinfo(jnp.int32).min),
                         axis=1, keepdims=True)
        delta = jnp.maximum(newest - ts, 0).astype(jnp.float32)
        bucket = jnp.floor(jnp.log2(delta + 1.0)).astype(jnp.int32)
        bucket = jnp.clip(bucket, 0, n_buckets - 1)
        return jnp.where(valid, bucket, 0)

    @staticmethod
    def _time_bucket_matrix(input_timestamps, input_mask, n_buckets):
        """``[B, S, S]`` int32 query-key time-delta buckets — the index
        law behind the temporal attention bias (consumed by
        :meth:`_relative_time_bias` on every attention path).

        Bucket law: delta = t_query - t_key in integer seconds (exact for
        int32 stamps; see :meth:`_recency_buckets` on why not float);
        magnitude = clip(floor(log2(|delta| + 1)), 0, half - 1) with
        half = n_buckets // 2; bucket = magnitude for delta >= 0,
        half + magnitude for delta < 0. Delta 0 -> bucket 0.
        """
        b, s = input_mask.shape
        if input_timestamps is None:
            # no signal: every pair is bucket 0 — a per-head constant that
            # softmax normalizes away
            return jnp.zeros((b, s, s), jnp.int32)
        ts = input_timestamps.astype(jnp.int32)
        # garbage stamps at padded slots index arbitrary buckets, but
        # every padded KEY carries the -1e9 pad-mask bias and padded
        # QUERY rows produce no output that survives the MLM position
        # gather — so no pinning is needed; deltas are only meaningful
        # between real positions
        delta = ts[:, :, None] - ts[:, None, :]              # [B, S, S]
        half = max(n_buckets // 2, 1)
        mag = jnp.floor(
            jnp.log2(jnp.abs(delta).astype(jnp.float32) + 1.0)
        ).astype(jnp.int32)
        mag = jnp.clip(mag, 0, half - 1)
        bucket = jnp.where(delta >= 0, mag, half + mag)
        return jnp.clip(bucket, 0, n_buckets - 1)

    @staticmethod
    def _relative_time_bias(bias_table, input_timestamps, input_mask):
        """Per-head additive attention bias ``[B, n_heads, S, S]`` from
        signed log2-bucketized query-key time deltas (TiSASRec-style,
        adapted: the paper's interval key/value embeddings become one
        learned scalar per (bucket, head) — an additive score bias, which
        keeps the attention matmuls dense and MXU-shaped). The ONE dense
        form both attention paths consume: added into ``attn_bias`` on
        the XLA fallback, streamed per cell into the fused kernel
        (``rel_bias``). Built via :func:`_rel_lookup`, whose custom VJP
        replaces the TPU-hostile scatter-add with fused per-bucket
        reductions."""
        n_buckets, n_heads = bias_table.shape
        bucket = Bert4RecEncoder._time_bucket_matrix(
            input_timestamps, input_mask, n_buckets)
        rel = _rel_lookup(n_buckets, bias_table, bucket)     # [B, S, S, n]
        return rel.transpose(0, 3, 1, 2).astype(jnp.float32)

    @staticmethod
    def get_embedding_table(params: dict) -> jnp.ndarray:
        """The tied item-embedding table [V, W] (reference :233-234).

        An int8-quantized table (models/quantization.py) is dequantized
        here — the correctness fallback; hot serving paths branch on the
        quantized form and never build this dense tensor."""
        emb = params["item_embeddings"]
        if "embedding_q" in emb:
            return L.dequantize_embedding(emb)
        return emb["embedding"]

    def get_config(self) -> dict:
        return self.config.to_dict()

    @classmethod
    def from_config(cls, config: dict,
                    dtype_policy: Optional[DTypePolicy] = None
                    ) -> "Bert4RecEncoder":
        return cls(BERT4RecConfig.from_dict(config), dtype_policy)
