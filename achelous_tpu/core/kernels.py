"""Central auto-enable policy for the production Pallas kernels.

Three kernels default on for TPU backends (fused bias-attention,
models/efficientformer.py; banded deformable sampling, ops/deform.py; FPS,
ops/pointops.py), each with a semantically identical XLA-composition
fallback.  This is the ONE switch their auto-detection consults.

ACHELOUS_NO_PALLAS=1 disables all three.  The known reason is a multi-chip
GSPMD mesh: `pallas_call` carries no partitioning rule yet, so the SPMD
partitioner cannot shard the kernel over the batch axis the way it shards
the surrounding XLA ops — the XLA fallbacks partition cleanly.  The mesh
entry points handle this themselves via the `no_pallas()` scope below
(AchelousPredictor.sharded_infer, train/loop.fit with mesh.size > 1), so
the env var remains only as a manual kill switch.  Single-chip
inference/training (this rig, and the per-round hardware equality gate
tools/tpu_kernel_check.py) keeps them on.
"""
from __future__ import annotations

import contextlib
import os

import jax

_FORCE_OFF = 0      # depth counter for nested no_pallas() scopes


def pallas_default() -> bool:
    """True when Pallas kernels should auto-enable (use_pallas=None)."""
    if _FORCE_OFF or os.environ.get("ACHELOUS_NO_PALLAS"):
        return False
    return jax.default_backend() in ("tpu", "axon")


@contextlib.contextmanager
def no_pallas():
    """Force the XLA fallback paths for code traced inside this scope.

    pallas_default() is consulted at TRACE time (python level), so wrapping
    a model apply in this context is enough — used by
    AchelousPredictor.sharded_infer, whose GSPMD-partitioned program cannot
    shard a pallas_call over the batch axis (see module docstring)."""
    global _FORCE_OFF
    _FORCE_OFF += 1
    try:
        yield
    finally:
        _FORCE_OFF -= 1
