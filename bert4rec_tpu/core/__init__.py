from bert4rec_tpu.core.mesh import (
    MeshConfig,
    create_mesh,
    distributed_initialize,
    batch_sharding,
    replicated_sharding,
)
from bert4rec_tpu.core.dtypes import DTypePolicy
from bert4rec_tpu.core.partitioning import (
    param_partition_specs,
    param_shardings,
    make_batch_specs,
)

__all__ = [
    "MeshConfig", "create_mesh", "distributed_initialize",
    "batch_sharding", "replicated_sharding",
    "DTypePolicy",
    "param_partition_specs", "param_shardings", "make_batch_specs",
]
