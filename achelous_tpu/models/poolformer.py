"""PoolFormer backbone (`pf`) — MetaFormer with avg-pool token mixing.

reference backbone/vision/poolformer_modules/poolformer.py:65-216,244-430 and
the Achelous-specific S0/S1/S2 subclasses (:546-595) pinned to the shared
width table.  Norm is GroupNorm(1 group) == LayerNorm over (H, W, C) with
per-channel affine; token mixer is avgpool(3, count_include_pad=False) - x.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class GroupNorm1(nn.Module):
    """torch GroupNorm(1, C): normalize over (H, W, C), per-channel affine."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class PoolFormerBlock(nn.Module):
    """poolformer.py:166-216."""
    dim: int
    pool_size: int = 3
    mlp_ratio: float = 4.0
    layer_scale_init_value: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.pool_size // 2
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(self.layer_scale_init_value),
                         (self.dim,), jnp.float32)
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(self.layer_scale_init_value),
                         (self.dim,), jnp.float32)
        y = GroupNorm1(dtype=self.dtype, name="norm1")(x)
        pooled = nn.avg_pool(y, (self.pool_size, self.pool_size),
                             strides=(1, 1), padding=((p, p), (p, p)),
                             count_include_pad=False)
        x = x + ls1.astype(x.dtype) * (pooled - y)
        y = GroupNorm1(dtype=self.dtype, name="norm2")(x)
        y = nn.Conv(int(self.dim * self.mlp_ratio), (1, 1), dtype=self.dtype,
                    name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="mlp_fc2")(y)
        return x + ls2.astype(x.dtype) * y


class PoolFormer(nn.Module):
    """poolformer.py:244-430 with fork_feat=True: per-stage GroupNorm outputs."""
    layers: Sequence[int]
    embed_dims: Sequence[int]
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    layer_scale_init_value: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        # stem: 7x7 stride-4 pad-2 conv (in_patch_size=7, in_stride=4, in_pad=2)
        x = nn.Conv(self.embed_dims[0], (7, 7), strides=4,
                    padding=[(2, 2), (2, 2)], dtype=self.dtype,
                    name="patch_embed")(x)
        feats = []
        for i in range(4):
            for j in range(self.layers[i]):
                x = PoolFormerBlock(self.embed_dims[i],
                                    mlp_ratio=self.mlp_ratios[i],
                                    layer_scale_init_value=self.layer_scale_init_value,
                                    dtype=self.dtype,
                                    name=f"stage{i}_block{j}")(x)
            feats.append(GroupNorm1(dtype=self.dtype, name=f"norm_out{i}")(x))
            if i < 3:
                x = nn.Conv(self.embed_dims[i + 1], (3, 3), strides=2,
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name=f"down_embed{i}")(x)
        return tuple(feats)


def poolformer_s0(**kw):
    """poolformer.py:546-560."""
    return PoolFormer(layers=(2, 2, 6, 2), embed_dims=(32, 48, 96, 176), **kw)


def poolformer_s1(**kw):
    return PoolFormer(layers=(4, 4, 12, 4), embed_dims=(32, 48, 120, 224), **kw)


def poolformer_s2(**kw):
    return PoolFormer(layers=(6, 6, 18, 6), embed_dims=(32, 64, 144, 288),
                      layer_scale_init_value=1e-6, **kw)


POOLFORMER_VARIANTS = {"S0": poolformer_s0, "S1": poolformer_s1,
                       "S2": poolformer_s2}
