"""Parameter & batch partition specs.

The sharding story (SURVEY.md §2.9, BASELINE.json north star):

- item embedding table ``[V, W]`` -> ``P('model', None)`` (vocab/row-sharded);
- MLM output bias ``[V]``         -> ``P('model')`` (follows the logits);
- every other parameter            -> replicated ``P()`` (the shipped encoders
  are <=256 hidden / 2 layers — sharding them would cost more in collectives
  than it saves);
- batches                          -> leading dim over ``P('data')``.

Specs are derived from parameter *paths* so the model code stays free of
sharding annotations.
"""

import re
import warnings
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bert4rec_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

# path-regex -> spec builder; first match wins
_RULES = (
    # the tied item-embedding table: rows = vocab
    (re.compile(r"item_embeddings.*embedding$"), P(MODEL_AXIS, None)),
    # mlm output bias over the vocab
    (re.compile(r"output_bias$"), P(MODEL_AXIS)),
)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def _spec_for_leaf(path, leaf) -> P:
    p = _path_str(path)
    for rule, spec in _RULES:
        if rule.search(p):
            if len(spec) > getattr(leaf, "ndim", 0):
                # scalar / lower-rank leaf that matched by name
                return P(*spec[: leaf.ndim])
            return spec
    return P()


def param_partition_specs(params: Any) -> Any:
    """Map a param pytree to a pytree of PartitionSpecs by path."""
    return jax.tree_util.tree_map_with_path(_spec_for_leaf, params)


def _shardable(mesh: Mesh, shape, spec: P) -> bool:
    for dim, axes in enumerate(spec):
        if axes is None:
            continue
        axes = (axes,) if isinstance(axes, str) else axes
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if dim >= len(shape) or shape[dim] % size != 0:
            return False
    return True


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Path rules -> NamedShardings, replicating any leaf whose sharded dims
    are not divisible by the mesh axis (e.g. a 43-item vocab on a 2-way
    'model' axis) — pad the vocab via ``BERT4RecConfig.vocab_pad_to`` to
    actually shard it."""
    def to_sharding(path, leaf):
        spec = _spec_for_leaf(path, leaf)
        shape = getattr(leaf, "shape", ())
        if not _shardable(mesh, shape, spec):
            warnings.warn(
                f"Parameter {_path_str(path)} of shape {shape} cannot be "
                f"sharded as {spec} on mesh {dict(mesh.shape)}; replicating. "
                f"Pad the dimension (e.g. vocab_pad_to) to shard it.")
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def make_batch_specs(batch: Any) -> Any:
    """PartitionSpecs sharding every batch leaf's leading dim over 'data'."""
    def spec_for(leaf):
        return P(DATA_AXIS, *([None] * (leaf.ndim - 1)))
    return jax.tree.map(spec_for, batch)


def place_batch(mesh: Mesh, arrays: dict, stacked: bool = False,
                what: str = "batch") -> dict:
    """Device-place a feature dict with its batch dim sharded over 'data'
    (dim 1 of ``[K, B, ...]`` leaves when ``stacked``).

    The ONE multi-host global-batch assembly in the codebase (trainer and
    evaluator both route through it): validates that the GLOBAL batch (the
    per-process slice times ``process_count``) divides the 'data' axis,
    then assembles distributed global arrays from the per-process local
    slices via ``jax.make_array_from_process_local_data`` — or plain
    ``device_put`` single-process.
    """
    first = np.asarray(next(iter(arrays.values())))
    b = first.shape[1] if stacked else first.shape[0]
    b_global = b * jax.process_count()
    data_size = dict(mesh.shape).get(DATA_AXIS, 1)
    if b_global % max(data_size, 1) != 0:
        raise ValueError(
            f"global {what} size {b_global} ({b} per process) does not "
            f"divide the mesh's 'data' axis ({data_size} devices) — pick "
            f"a multiple (got mesh {dict(mesh.shape)})")

    def sharding(v):
        v = np.asarray(v)
        spec = make_batch_specs({"x": v[0] if stacked else v})["x"]
        if stacked:
            spec = P(None, *spec)
        return NamedSharding(mesh, spec)

    shardings = {k: sharding(v) for k, v in arrays.items()}
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
            shardings[k], np.asarray(v)) for k, v in arrays.items()}
    return jax.device_put(arrays, shardings)
