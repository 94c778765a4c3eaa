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


def _leaf_to_numpy(leaf):
    """Host value of a leaf; multi-host sharded arrays are gathered.

    Under ``jax.process_count() > 1`` the train state's leaves are global
    ``jax.Array``s whose shards live on other processes' devices too —
    ``np.asarray`` on those raises. ``process_allgather`` is a collective:
    every process must reach this call (they do — the trainer runs callbacks
    identically on all processes)."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils
        leaf = multihost_utils.process_allgather(leaf, tiled=True)
    return np.asarray(leaf)


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
    """Save every array leaf of ``tree`` to ``path`` (a ``.npz`` file).

    Multi-host safe: leaf gathering is a collective every process joins
    (:func:`_leaf_to_numpy`), but only process 0 writes the file —
    concurrent writers to one path would corrupt it — and a global barrier
    afterwards guarantees the checkpoint is visible (on a shared
    filesystem) before any process resumes past the save."""
    path = pathlib.Path(path)
    multi_host = jax.process_count() > 1
    leaves = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        leaves[_path_key(p)] = _leaf_to_numpy(leaf)
    if not multi_host or jax.process_index() == 0:
        path.parent.mkdir(parents=True, exist_ok=True)
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
    if multi_host:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"save_pytree:{path}")


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
