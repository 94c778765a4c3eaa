"""Ahead-of-time serving export (``jax.export``).

The reference ships serving as a Keras SavedModel (reference
``bert4rec/models/model_wrapper.py:24-74`` — architecture + weights,
reloaded into a Python runtime). The TPU-native equivalent is an AOT
artifact: the serving computation is jitted, lowered to StableHLO with the
**weights embedded as constants**, and serialized to bytes. A serving
process deserializes and calls it — no model Python code, no config
registry, no weight files; one file is the whole serving surface.

The batch dimension is exported *symbolically* by default, so one artifact
serves any batch size; sequence length and prediction count stay static
(the framework's static-shape discipline — XLA compiles one program per
distinct shape at call time, cached).

Exported entry points::

    top_k:            (input_word_ids [b,S], input_mask [b,S],
                       masked_lm_positions [b,P]) -> (ids, scores) [b,P,k]
    score_candidates: (... , candidates [b,P,C]) -> logits [b,P,C]

Artifacts lower for the platform they are exported on (TPU artifacts embed
the Pallas kernel custom-calls and only run on TPU). For a portable
artifact export with ``platforms=("cpu", "tpu")`` and a config with the
fused kernels disabled.
"""

import pathlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _batch_dim(batch_size):
    """A concrete batch dim, or a fresh symbolic 'b' when None."""
    if batch_size is not None:
        return int(batch_size)
    return jax_export.symbolic_shape("b")[0]


def _spec(shape, dtype=jnp.int32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _export(fn, specs, platforms):
    jitted = jax.jit(fn)
    if platforms is not None:
        return jax_export.export(jitted, platforms=tuple(platforms))(*specs)
    return jax_export.export(jitted)(*specs)


def _prepare_params(params, quantize):
    params = jax.device_get(params)   # embed as host constants
    if quantize is None:
        return params
    if quantize != "int8":
        raise ValueError(f"unknown quantize mode {quantize!r}; "
                         "supported: None, 'int8'")
    from bert4rec_tpu.models import quantization
    return jax.device_get(quantization.quantize_params(params))


def export_top_k(model, params, k: int, *,
                 batch_size: Optional[int] = None,
                 num_positions: Optional[int] = None,
                 num_exclude: Optional[int] = None,
                 platforms: Optional[Sequence[str]] = None,
                 quantize: Optional[str] = None
                 ) -> jax_export.Exported:
    """Export full-vocab top-k ranking (``model.rank_top_k`` math) with the
    weights baked in.

    :param batch_size: concrete batch, or None for a symbolic batch dim
    :param num_positions: masked positions per row (default: the config's
        ``max_predictions_per_seq``)
    :param num_exclude: when set, the exported computation takes a FOURTH
        input ``exclude [b, num_exclude]`` of item ids (< 0 = padding)
        removed from the ranking per row — seen-item/special exclusion for
        recommendation serving (apps.ArtifactRecommender)
    :param platforms: lowering platforms (default: current backend)
    :param quantize: ``"int8"`` embeds the item table weights-only
        quantized (models/quantization.py) — ~4x smaller artifact and 4x
        less table traffic at catalog scale
    """
    cfg = model.config
    s = cfg.max_sequence_length
    p = num_positions or cfg.max_predictions_per_seq
    params = _prepare_params(params, quantize)

    def serve_top_k(input_word_ids, input_mask, masked_lm_positions,
                    exclude=None):
        inputs = {"input_word_ids": input_word_ids,
                  "input_mask": input_mask,
                  "masked_lm_positions": masked_lm_positions}
        return model.rank_top_k(params, inputs, k, exclude=exclude)

    b = _batch_dim(batch_size)
    specs = [_spec((b, s)), _spec((b, s)), _spec((b, p))]
    if num_exclude is not None:
        specs.append(_spec((b, int(num_exclude))))
    return _export(serve_top_k, specs, platforms)


def export_score_candidates(model, params, num_candidates: int, *,
                            batch_size: Optional[int] = None,
                            num_positions: Optional[int] = None,
                            platforms: Optional[Sequence[str]] = None,
                            quantize: Optional[str] = None
                            ) -> jax_export.Exported:
    """Export candidate-only scoring (``model.score_candidates`` math —
    the [B,P,C] eval/serving hot path that never builds full-vocab logits)
    with the weights baked in. ``quantize="int8"`` as in
    :func:`export_top_k`."""
    cfg = model.config
    s = cfg.max_sequence_length
    p = num_positions or cfg.max_predictions_per_seq
    params = _prepare_params(params, quantize)

    def serve_scores(input_word_ids, input_mask, masked_lm_positions,
                     candidates):
        inputs = {"input_word_ids": input_word_ids,
                  "input_mask": input_mask,
                  "masked_lm_positions": masked_lm_positions}
        return model.score_candidates(params, inputs, candidates)

    b = _batch_dim(batch_size)
    return _export(serve_scores,
                   [_spec((b, s)), _spec((b, s)), _spec((b, p)),
                    _spec((b, p, num_candidates))],
                   platforms)


def save_artifact(exported: jax_export.Exported, path) -> None:
    """Serialize an exported computation to one self-contained file."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(exported.serialize())
    tmp.replace(path)


def load_artifact(path) -> jax_export.Exported:
    """Deserialize a serving artifact; run it with ``artifact.call(...)``.

    Needs only jax — none of the model's Python code or weight files."""
    return jax_export.deserialize(pathlib.Path(path).read_bytes())
