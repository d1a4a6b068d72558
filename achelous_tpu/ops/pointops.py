"""Point-cloud set operations: farthest point sampling, ball query, grouping.

The reference claims PointNet++ configs (README.md:63,82-83) but the snapshot
lacks the implementation (SURVEY.md §2.3) — these are the standard CUDA ops
of the official PointNet++ repos, re-expressed for TPU with static shapes:

  * FPS is a fori_loop of `npoint` steps over a [B, N] min-distance vector —
    sequentially dependent by definition, but each step is one cheap VPU op.
  * Ball query materializes the [B, S, N] pairwise-distance matrix (tiny at
    radar scale: 512 x 128) and picks the first `nsample` in-radius points
    via top_k on a rank key, exactly matching the CUDA op's first-k-found
    semantics (out-of-radius slots repeat the first found neighbor).
  * Grouping is a batched gather.

At 512 radar points everything fits in VMEM and XLA fuses the whole pipeline;
a Pallas formulation is unnecessary at this scale.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def square_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared L2 distance between [B,S,3] and [B,N,3]."""
    diff = a[:, :, None, :] - b[:, None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          valid: jnp.ndarray | None = None,
                          use_pallas: bool | None = None) -> jnp.ndarray:
    """FPS indices [B, npoint] over xyz [B, N, 3]; starts at point 0
    (deterministic, unlike the CUDA op's random start).

    On TPU backends the whole sequential loop runs inside one Pallas kernel
    (ops/pallas_pointops.py — faster where the npoint-step XLA loop is
    dispatch/launch-overhead-bound; exact same indices, pinned by
    tests/test_pallas_pointops.py, and timed per round by
    tools/latency_ablation.py).  use_pallas=None auto-selects by backend
    AND batch: the kernel's grid runs per batch element so its cost is
    linear in batch, while the XLA fori_loop's is near-constant
    (dispatch-bound).  Measured (LATENCY_ABLATION.json, 512->128 v5e):
    Pallas 0.027 vs XLA 0.41 ms at bs=1, but 1.86 vs 0.55 ms at bs=32 —
    ~0.058 ms/sample against a ~0.5 ms floor puts the crossover near bs=8.
    Under a batch mesh the kernel runs per-shard, so gate on the per-shard
    batch (same policy as the fused RadarConv gate, ops/deform.py)."""
    from achelous_tpu.core.kernels import (batch_mesh, interpret_default,
                                           pallas_default, shard_wrap)
    if use_pallas is None:
        use_pallas = pallas_default(batch_size=xyz.shape[0])
        if use_pallas:
            import os
            cap = int(os.environ.get("ACHELOUS_FPS_PALLAS_MAX_BATCH", "8"))
            ctx = batch_mesh()
            shard_bs = xyz.shape[0] // (ctx[0].size if ctx is not None else 1)
            use_pallas = shard_bs <= cap
    if use_pallas:
        from achelous_tpu.ops.pallas_pointops import \
            pallas_farthest_point_sample
        interp = interpret_default()
        if valid is None:
            fn = shard_wrap(
                lambda xx: pallas_farthest_point_sample(
                    xx, npoint, interpret=interp), (True,))
            return fn(xyz)
        fn = shard_wrap(
            lambda xx, vv: pallas_farthest_point_sample(
                xx, npoint, vv, interpret=interp), (True, True))
        return fn(xyz, valid)
    b, n, _ = xyz.shape
    big = jnp.asarray(1e10, xyz.dtype)
    dist = jnp.full((b, n), big, xyz.dtype)
    if valid is not None:
        dist = jnp.where(valid, dist, -1.0)   # never pick padding

    def body(i, state):
        dist, idxs, farthest = state
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None].repeat(3, -1),
                                       axis=1)             # [B,1,3]
        d = jnp.sum((xyz - centroid) ** 2, -1)              # [B,N]
        dist = jnp.minimum(dist, d) if valid is None else \
            jnp.where(valid, jnp.minimum(dist, d), -1.0)
        idxs = idxs.at[:, i].set(farthest)
        farthest = jnp.argmax(dist, -1).astype(jnp.int32)
        return dist, idxs, farthest

    idxs = jnp.zeros((b, npoint), jnp.int32)
    farthest = jnp.zeros((b,), jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(0, npoint, body, (dist, idxs, farthest))
    return idxs


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points [B, N, C] by integer index array [B, ...]."""
    b = points.shape[0]
    flat = idx.reshape(b, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(*idx.shape, points.shape[-1])


def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Indices [B, S, nsample] of up to nsample points within `radius` of
    each center; slots beyond the found count repeat the first in-radius
    point (standard PointNet++ semantics)."""
    d2 = square_distance(new_xyz, xyz)                 # [B, S, N]
    n = xyz.shape[1]
    nsample = min(nsample, n)   # coarse levels may have fewer points than K
    in_ball = d2 <= radius ** 2
    order = jnp.arange(n, dtype=jnp.float32)
    # rank key: in-radius points keep their index order, others pushed to +inf
    key = jnp.where(in_ball, order, jnp.inf)
    _, idx = jax.lax.top_k(-key, nsample)              # first nsample by index
    idx = idx.astype(jnp.int32)
    any_found = jnp.any(in_ball, axis=-1, keepdims=True)
    first = idx[..., :1]
    taken = jnp.take_along_axis(key, idx, axis=-1) < jnp.inf
    idx = jnp.where(taken, idx, first)                 # pad with first found
    # degenerate center with zero neighbors: use point 0
    idx = jnp.where(any_found, idx, 0)
    return idx


def sample_and_group(npoint: int, radius: float, nsample: int,
                     xyz: jnp.ndarray, feats: jnp.ndarray | None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PointNet++ set-abstraction grouping: FPS centers + ball-query
    neighborhoods, features = [relative xyz, point feats]."""
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)               # [B, S, 3]
    g_idx = ball_query(radius, nsample, xyz, new_xyz)  # [B, S, K]
    grouped_xyz = index_points(xyz, g_idx) - new_xyz[:, :, None, :]
    if feats is not None:
        grouped = jnp.concatenate([grouped_xyz, index_points(feats, g_idx)],
                                  axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped
