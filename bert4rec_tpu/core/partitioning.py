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
