"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DataParallel / DDP+NCCL path (reference train.py:313-324,415-420,
576-580, SURVEY.md §2.8).

The model is 3.5-15M params, so the production-correct parallelism is pure
data parallelism: params replicated, batch sharded over a 1-D `data` mesh
axis; XLA/GSPMD inserts the gradient all-reduce over ICI automatically and
BatchNorm's global-batch mean doubles as sync-BN.  TP/PP/SP/EP are not
applicable at this scale (the reference has none either) — the helpers below
still accept an arbitrary mesh shape so larger variants can add axes.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data mesh over the GLOBAL device set.

    `jax.devices()` already spans every process after `jax.distributed`
    initialization, so the same call is multi-host correct: each host sees
    the full mesh but owns only its addressable slice (the SPMD analogue of
    the reference's rank-local DDP wrap, train.py:415-420).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host batch dict onto the mesh, sharded along dim 0."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def local_batch_size(global_batch_size: int, mesh: Mesh,
                     axis: str = "data") -> int:
    """Per-process share of the global batch (the reference divides
    batch_size by ngpus_per_node under DDP, train.py:580)."""
    n_proc = max(len({d.process_index for d in mesh.devices.flat}), 1)
    if global_batch_size % (n_proc or 1):
        raise ValueError(f"global batch {global_batch_size} not divisible "
                         f"by {n_proc} processes")
    return global_batch_size // n_proc


def global_shard_batch(local_batch: Any, mesh: Mesh,
                       axis: str = "data") -> Any:
    """Assemble each process's LOCAL numpy batch into global jax.Arrays
    sharded along dim 0 of the mesh.

    Multi-host replacement for the reference's DistributedSampler +
    per-rank DataLoader (train.py:576-603): every host feeds only its own
    slice (see data/sampler.DistributedSampler) and XLA sees one global
    batch.  Single-process meshes reduce to a plain device_put.
    """
    sh = batch_sharding(mesh, axis)
    if len({d.process_index for d in mesh.devices.flat}) <= 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh),
                                      local_batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, replicated(mesh))
