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
from typing import Any

import jax
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


def param_partition_specs(params: Any) -> Any:
    """Map a param pytree to a pytree of PartitionSpecs by path."""
    def spec_for(path, leaf):
        p = _path_str(path)
        for rule, spec in _RULES:
            if rule.search(p):
                if len(spec) > getattr(leaf, "ndim", 0):
                    # scalar / lower-rank leaf that matched by name
                    return P(*spec[: leaf.ndim])
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    specs = param_partition_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def make_batch_specs(batch: Any) -> Any:
    """PartitionSpecs sharding every batch leaf's leading dim over 'data'."""
    def spec_for(leaf):
        return P(DATA_AXIS, *([None] * (leaf.ndim - 1)))
    return jax.tree.map(spec_for, batch)
