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
