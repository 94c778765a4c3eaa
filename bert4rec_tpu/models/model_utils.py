"""Model utilities (reference ``bert4rec/models/model_utils.py:8-64``)."""

import pathlib
from typing import Optional, Union

import jax
import jax.numpy as jnp

from bert4rec_tpu.utils import utils


def determine_model_path(path: Union[str, pathlib.Path],
                         mode: int = 0) -> pathlib.Path:
    """Resolve a model save path (reference model_utils.py:8-38).

    mode 0 -> relative to the default model save dir under the project root;
    mode 1 -> relative to the environment base dir; mode 2 -> as given.
    """
    path = pathlib.Path(path)
    if path.is_absolute():
        return path
    if mode == 0:
        return utils.get_default_model_save_path() / path
    if mode == 1:
        return utils.get_virtual_env_path() / path
    if mode == 2:
        return path
    raise ValueError(f"Unknown path mode: {mode}")


def init_output_bias_from_popularity(params: dict,
                                     item_counts,
                                     smoothing: float = 1.0) -> dict:
    """Return a copy of ``params`` with the MLM ``output_bias`` set to the
    log of the (smoothed) item prior instead of zeros.

    On catalogs where most of the softmax width is rarely (or never)
    observed, a zero-initialized bias makes the model spend its first
    training phase learning plain popularity — gradient dynamics sit on a
    long saddle at loss = ln(n_observed_items) before any sequence
    structure is learned (measured: the Reddit-scale quality smoke,
    tools/quality_run.py). Initializing the bias to the log prior skips
    that phase: the initial loss starts at the popularity entropy and all
    gradient signal goes into the sequence model. The reference has no
    counterpart (its head bias starts at zero); this is a standard
    language-model trick applied to the 335k-item regime the reference
    never trains at.

    :param params: the model param pytree from :meth:`BERT4RecModel.init`
    :param item_counts: occurrence count per token id, length <= the
        bias length (shorter arrays are zero-padded — e.g.
        ``np.bincount(tokenized_source)`` over the training item stream;
        special tokens at ids 0-2 may carry zero counts)
    :param smoothing: additive (Laplace) smoothing so unseen items get a
        finite floor rather than -inf
    :returns: new param pytree (input is not mutated)
    """
    import numpy as np

    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    bias = params["mlm"]["output_bias"]
    counts = np.zeros(bias.shape[0], np.float64)
    item_counts = np.asarray(item_counts, np.float64)
    if item_counts.ndim != 1 or item_counts.shape[0] > bias.shape[0]:
        raise ValueError(
            f"item_counts must be 1-D with length <= {bias.shape[0]}, "
            f"got shape {item_counts.shape}")
    counts[:item_counts.shape[0]] = item_counts
    log_prior = np.log(counts + smoothing) - np.log(counts.sum()
                                                    + smoothing * len(counts))
    new_params = dict(params)
    new_params["mlm"] = dict(params["mlm"])
    new_params["mlm"]["output_bias"] = jnp.asarray(log_prior, bias.dtype)
    return new_params


def rank_items(logits: jnp.ndarray,
               embeddings: Optional[jnp.ndarray] = None,
               items: Optional[jnp.ndarray] = None) -> tuple:
    """Standalone ranking math (reference model_utils.py:41-64).

    :param logits: either final logits over the vocab, or hidden states to be
        scored against ``embeddings`` via matmul when given.
    :param items: optional candidate id array gathered before ranking.
    :returns: (rankings, probabilities)
    """
    if embeddings is not None:
        logits = jnp.einsum("...h,vh->...v", logits, embeddings,
                            preferred_element_type=jnp.float32)
    probabilities = jax.nn.softmax(logits, axis=-1)
    if items is not None:
        items = jnp.asarray(items)
        gathered = jnp.take_along_axis(
            logits, items, axis=-1) if items.ndim == logits.ndim else logits[..., items]
        order = jnp.argsort(-gathered, axis=-1)
        rankings = jnp.take_along_axis(
            items, order, axis=-1) if items.ndim == logits.ndim else items[order]
    else:
        rankings = jnp.argsort(-logits, axis=-1)
    return rankings, probabilities
