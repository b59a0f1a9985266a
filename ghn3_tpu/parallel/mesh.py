"""Device mesh + sharding helpers.

Replaces the reference's torch.distributed/NCCL layer (/root/reference/ghn3/
ddp_utils.py) with single-program SPMD: a 1-d ``data`` mesh (extendable with a
``model`` axis for sharding the decoder), NamedShardings for batch-dim sharding,
and XLA-inserted collectives (grads of replicated params against sharded batches
are all-reduced automatically by the SPMD partitioner — no explicit DDP hooks,
no barriers).

Multi-host bootstrap goes through `jax.distributed.initialize` (torchrun env
replacement); single-process and multi-chip runs use the same code path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX when launched under a cluster scheduler
    (reference setup_ddp reads torchrun's RANK/WORLD_SIZE; JAX picks up its own
    coordinator env or explicit args)."""
    if int(os.environ.get('GHN3_TPU_DIST', '0')):
        jax.distributed.initialize()


def data_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=('data',))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First (batch) dimension split over the data axis."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, array):
    return jax.device_put(array, batch_sharding(mesh))


def num_shards(mesh: Optional[Mesh]) -> int:
    return int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0
