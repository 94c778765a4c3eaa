"""Device mesh & distributed runtime bring-up.

This is the layer the reference does not have (SURVEY.md §2.9): a
``(data, model)`` mesh over all chips. The encoder runs data-parallel over the
``data`` axis; the item-embedding table and tied softmax head are vocab-sharded
over the ``model`` axis. XLA/GSPMD inserts the collectives (psum for DP
gradient reduction, all-gather/all-to-all for the sharded lookup/logits) riding
ICI within a slice and DCN across hosts.
"""

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass
class MeshConfig:
    """How to lay the device grid onto (data, model) axes.

    ``model_parallelism`` chips shard the vocab dimension; the rest are data
    parallel. The default (1) is the right call for every shipped reference
    config except Reddit's 335k-item vocab (SURVEY.md §7 hard part 3).
    """
    model_parallelism: int = 1
    data_parallelism: Optional[int] = None  # None = all remaining devices

    def resolve(self, n_devices: int) -> tuple:
        mp = self.model_parallelism
        if n_devices % mp != 0:
            raise ValueError(
                f"model_parallelism={mp} does not divide device count "
                f"{n_devices}")
        dp = self.data_parallelism or n_devices // mp
        if dp * mp != n_devices:
            raise ValueError(
                f"data_parallelism={dp} * model_parallelism={mp} != device "
                f"count {n_devices}")
        return dp, mp


def distributed_initialize(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host process bring-up (jax.distributed).

    No-op when running single-process without coordinator env/args; safe to
    call unconditionally at program start.
    """
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_mesh(mesh_config: Optional[MeshConfig] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh over the given (or all) devices."""
    mesh_config = mesh_config or MeshConfig()
    if devices is None:
        devices = jax.devices()
    dp, mp = mesh_config.resolve(len(devices))
    grid = np.asarray(devices).reshape(dp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
