"""PointNet++ (SSG) semantic segmentation branch — the `pn2` pc model.

The reference README benchmarks EN-GDF-PN2 rows (README.md:82-83,101-102) but
the snapshot ships no implementation (nets/Achelous.py:31-32 would crash on
pc_seg='pn2'; SURVEY.md §2.3).  This follows the canonical
pointnet2_sem_seg architecture (4 set-abstraction + 4 feature-propagation
levels, mlp widths [32,32,64]/[64,64,128]/[128,128,256]/[256,256,512], FP
[256,256]/[256,256]/[256,128]/[128,128,128]) with npoint/radius scaled to the
512-point radar frames.  Matches the official model's ~0.97M params,
consistent with the published +0.09M delta of PN2 over PN configs
(README.md:81 vs :83).

Layout [B, N, C]; grouping ops from achelous_tpu.ops.pointops.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp

from achelous_tpu.ops.pointops import (index_points, sample_and_group,
                                       square_distance)

Dtype = Any


def _mlp_bn_relu(x, feats, name, train, dtype):
    x = nn.Dense(feats, dtype=dtype, name=f"{name}_dense")(x)
    x = F32BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=dtype, name=f"{name}_bn")(x)
    return nn.relu(x)


class SetAbstraction(nn.Module):
    """PointNetSetAbstraction (SSG): FPS + ball query + per-group pointnet +
    max pool."""
    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False):
        new_xyz, grouped = sample_and_group(self.npoint, self.radius,
                                            self.nsample, xyz, feats)
        x = grouped                                  # [B, S, K, 3+C]
        for i, f in enumerate(self.mlp):
            x = _mlp_bn_relu(x, f, f"mlp_{i}", train, self.dtype)
        return new_xyz, jnp.max(x, axis=2)           # [B, S, mlp[-1]]


class FeaturePropagation(nn.Module):
    """PointNetFeaturePropagation: inverse-distance 3-NN interpolation + mlp."""
    mlp: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2, train: bool = False):
        """Interpolate feats2 (at xyz2, sparse) onto xyz1 (dense); concat with
        feats1 (skip connection) and run the mlp."""
        b, n, _ = xyz1.shape
        s = xyz2.shape[1]
        if s == 1:
            interp = jnp.broadcast_to(feats2, (b, n, feats2.shape[-1]))
        else:
            d2 = square_distance(xyz1, xyz2)          # [B, N, S]
            k = min(3, s)
            negd, idx = jax.lax.top_k(-d2, k)
            w = 1.0 / (-negd + 1e-8)
            w = w / jnp.sum(w, -1, keepdims=True)
            neigh = index_points(feats2, idx)         # [B, N, k, C]
            interp = jnp.sum(neigh * w[..., None], axis=2)
        x = interp if feats1 is None else \
            jnp.concatenate([feats1, interp], axis=-1)
        for i, f in enumerate(self.mlp):
            x = _mlp_bn_relu(x, f, f"mlp_{i}", train, self.dtype)
        return x


class PointNet2Seg(nn.Module):
    """pointnet2_sem_seg scaled to 512-point radar frames; returns per-point
    log-probs [B, N, num_classes] (same contract as PointNetSeg)."""
    num_classes: int
    npoints: Sequence[int] = (128, 32, 8, 4)
    radii: Sequence[float] = (0.1, 0.2, 0.4, 0.8)
    nsamples: Sequence[int] = (32, 32, 32, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, N, C] with xyz in the first 3 channels
        xyz0 = x[..., :3].astype(jnp.float32)
        f0 = x
        mlps = ((32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 256, 512))
        xyzs, feats = [xyz0], [f0]
        for i in range(4):
            nxyz, nf = SetAbstraction(self.npoints[i], self.radii[i],
                                      self.nsamples[i], mlps[i],
                                      dtype=self.dtype,
                                      name=f"sa{i + 1}")(xyzs[-1], feats[-1],
                                                         train)
            xyzs.append(nxyz)
            feats.append(nf)
        fp_mlps = ((256, 256), (256, 256), (256, 128), (128, 128, 128))
        f = feats[4]
        for i in range(4):
            lvl = 3 - i
            skip = feats[lvl] if lvl > 0 else None
            f = FeaturePropagation(fp_mlps[i], dtype=self.dtype,
                                   name=f"fp{lvl + 1}")(xyzs[lvl],
                                                        xyzs[lvl + 1],
                                                        skip, f, train)
        f = _mlp_bn_relu(f, 128, "head1", train, self.dtype)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head2")(f)
        # log-probs, matching the PN branch contract (pointnet_sem_seg.py:35)
        return nn.log_softmax(logits, axis=-1), None
