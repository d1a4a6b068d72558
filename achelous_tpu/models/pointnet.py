"""PointNet semantic segmentation branch for the raw radar point cloud.

reference nets/pointcloudseg/pointnet2/pointnet_sem_seg.py:13-37 and
pointnet_utils.py:10-133.  Layout is [B, N, C] (points-major) so every 1x1
"conv1d" is a Dense matmul on the MXU; the max-pool over points is a single
reduction.

Note: the reference output is log_softmax (pointnet_sem_seg.py:35) and the
training loop then applies log_softmax *again* before NLL
(utils/utils_fit.py:125) — a bug we fix in our train path (loss consumes these
log-probs directly) while keeping the module output log-probs for predict
parity.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax.numpy as jnp

Dtype = Any


def _mlp_bn_relu(x, feats, name, train, dtype, relu=True):
    x = nn.Dense(feats, dtype=dtype, name=f"{name}_dense")(x)
    x = F32BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=dtype, name=f"{name}_bn")(x)
    return nn.relu(x) if relu else x


class STN(nn.Module):
    """Spatial transformer predicting a k x k alignment matrix.

    reference pointnet_utils.py:10-85 (STN3d when k=3 over `channel` inputs,
    STNkd otherwise).
    """
    k: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):   # x: [B, N, C]
        b = x.shape[0]
        x = _mlp_bn_relu(x, 64, "conv1", train, self.dtype)
        x = _mlp_bn_relu(x, 128, "conv2", train, self.dtype)
        x = _mlp_bn_relu(x, 1024, "conv3", train, self.dtype)
        x = jnp.max(x, axis=1)                     # max over points
        x = _mlp_bn_relu(x, 512, "fc1", train, self.dtype)
        x = _mlp_bn_relu(x, 256, "fc2", train, self.dtype)
        x = nn.Dense(self.k * self.k, dtype=self.dtype, name="fc3")(x)
        iden = jnp.eye(self.k, dtype=x.dtype).reshape(1, self.k * self.k)
        return (x + iden).reshape(b, self.k, self.k)


class PointNetEncoder(nn.Module):
    """reference pointnet_utils.py:88-133 (global_feat=False,
    feature_transform=True as used by PointNet_SEG)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:  # x: [B, N, C]
        b, n, c = x.shape
        trans = STN(k=3, dtype=self.dtype, name="stn")(x, train)
        xyz = x[..., :3] @ trans                  # bmm on xyz only (:105-112)
        x = jnp.concatenate([xyz, x[..., 3:]], axis=-1) if c > 3 else xyz
        x = _mlp_bn_relu(x, 32, "conv1", train, self.dtype)
        trans_feat = STN(k=32, dtype=self.dtype, name="fstn")(x, train)
        x = x @ trans_feat
        pointfeat = x                             # 32-ch per-point features
        x = _mlp_bn_relu(x, 64, "conv2", train, self.dtype)
        x = _mlp_bn_relu(x, 128, "conv3", train, self.dtype, relu=False)
        gfeat = jnp.max(x, axis=1, keepdims=True)  # [B,1,128]
        gfeat = jnp.broadcast_to(gfeat, (b, n, 128))
        return jnp.concatenate([gfeat, pointfeat], axis=-1), trans_feat  # 160


class PointNetSeg(nn.Module):
    """reference pointnet_sem_seg.py:13-37 — returns per-point log-probs
    [B, N, num_classes] (and the 32x32 feature transform for the optional
    orthogonality regularizer, pointnet_sem_seg.py:40-49)."""
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, trans_feat = PointNetEncoder(dtype=self.dtype, name="feat")(x, train)
        x = _mlp_bn_relu(x, 128, "conv1", train, self.dtype)
        x = _mlp_bn_relu(x, 100, "conv2", train, self.dtype)
        x = _mlp_bn_relu(x, 64, "conv3", train, self.dtype)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="conv4")(x)
        return nn.log_softmax(x, axis=-1), trans_feat


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """|| T T^t - I ||_F mean (reference pointnet_utils.py:136-142)."""
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)
    gram = jnp.einsum("bij,bkj->bik", trans, trans)
    return jnp.mean(jnp.linalg.norm(gram - eye, axis=(1, 2)))
