"""Pytree checkpointing — npz-backed, structure-preserving.

Replaces the reference's Keras SavedModel / ModelCheckpoint persistence
(reference bert4rec_wrapper.py:46-82, bert4rec_trainer.py:45-58) with a
dependency-free format: every array leaf of a pytree is stored in one ``.npz``
under its tree path. Restoring requires a like-structured target pytree
(same pattern as orbax ``restore(target)``), which lets us round-trip optax
optimizer states (namedtuples/dataclasses) as well as plain param dicts —
fixing the reference's known gap of optimizer state not being restored on
resume (reference bert4rec_trainer.py:57-58).
"""

import os
import pathlib
import tempfile
from typing import Any

import jax
import numpy as np

_SEP = "/"


def _path_key(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return _SEP.join(parts)


def save_pytree(path, tree: Any) -> None:
    """Save every array leaf of ``tree`` to ``path`` (a ``.npz`` file)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        leaves[_path_key(p)] = np.asarray(leaf)
    # atomic write: tmp file in the same dir, then rename
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **leaves)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree` into ``target``'s
    structure (leaf dtypes/shapes come from the file)."""
    path = pathlib.Path(path)
    if not path.is_file():
        raise FileNotFoundError(f"No checkpoint file at {path}")
    with np.load(path, allow_pickle=False) as data:
        stored = dict(data)

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for p, leaf in paths_and_leaves:
        key = _path_key(p)
        if key not in stored:
            raise KeyError(
                f"Checkpoint {path} is missing leaf {key!r}; it has "
                f"{sorted(stored)[:8]}...")
        new_leaves.append(stored[key])
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
