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


def replicate_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, replicated(mesh))
