"""Composite conv blocks used by the neck families: CSP bottlenecks and
reparameterizable RepVGG blocks.

  - Bottleneck / CSPLayer   reference neck/cspdualfpn.py:42-78
  - RepVGGBlock             reference backbone/conv_utils/repvgg_conv.py:40-165

RepVGGBlock carries both forms: `deploy=False` builds the 3-branch training
topology; `deploy=True` builds the single fused 3x3 conv.  The train->deploy
parameter fold is a pure pytree transform in `achelous_tpu.core.reparam`.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp

from achelous_tpu.ops.primitives import ConvBN

Dtype = Any


class Bottleneck(nn.Module):
    """reference neck/cspdualfpn.py:42-56 — 1x1 reduce + 3x3, optional add."""
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBN(hidden, 1, act=self.act, dtype=self.dtype,
                   name="conv1")(x, train)
        # conv2 is constructed WITHOUT an act kwarg in the reference
        # (cspdualfpn.py:47) -> BaseConv's default ReLU, not silu
        y = ConvBN(self.features, 3, act="relu", dtype=self.dtype,
                   name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """reference neck/cspdualfpn.py:59-78 — cross-stage partial fuse."""
    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        x1 = ConvBN(hidden, 1, act=self.act, dtype=self.dtype,
                    name="conv1")(x, train)
        x2 = ConvBN(hidden, 1, act=self.act, dtype=self.dtype,
                    name="conv2")(x, train)
        for i in range(self.n):
            x1 = Bottleneck(hidden, shortcut=self.shortcut, expansion=1.0,
                            act=self.act, dtype=self.dtype,
                            name=f"m_{i}")(x1, train)
        y = jnp.concatenate([x1, x2], axis=-1)
        return ConvBN(self.features, 1, act=self.act, dtype=self.dtype,
                      name="conv3")(y, train)


class RepVGGBlock(nn.Module):
    """reference backbone/conv_utils/repvgg_conv.py:40-82.

    Train form: 3x3 conv+BN  +  1x1 conv+BN  +  identity BN (when shapes
    allow), then ReLU.  Deploy form: one 3x3 conv with bias
    (switch_to_deploy, repvgg_conv.py:150-165) — produced by
    core.reparam.fold_repvgg as a pure parameter transform.
    """
    features: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            y = nn.Conv(self.features, (3, 3), strides=self.stride,
                        padding=[(1, 1), (1, 1)],
                        feature_group_count=self.groups, use_bias=True,
                        dtype=self.dtype, name="rbr_reparam")(x)
            return nn.relu(y)

        cin = x.shape[-1]
        dense = nn.Conv(self.features, (3, 3), strides=self.stride,
                        padding=[(1, 1), (1, 1)],
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="rbr_dense_conv")(x)
        dense = F32BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="rbr_dense_bn")(dense)
        one = nn.Conv(self.features, (1, 1), strides=self.stride,
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, name="rbr_1x1_conv")(x)
        one = F32BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           name="rbr_1x1_bn")(one)
        y = dense + one
        if cin == self.features and self.stride == 1:
            ident = F32BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name="rbr_identity")(x)
            y = y + ident
        return nn.relu(y)
