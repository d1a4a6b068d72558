"""EdgeViT backbone (`ev`) — Local-Global-Local blocks.

reference backbone/vision/edgevit_modules/edgevit.py:12-360.  LocalAgg (conv
attention) when sr_ratio > 1, GlobalSparseAttn (stride-sr subsample -> MHSA ->
depthwise ConvTranspose LocalProp upsample).  Feature taps follow the
reference: feat2/3/4 are the PATCH-EMBED outputs (before the stage blocks),
feat5 is the final stage output after BN (edgevit.py:302-322).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp

Dtype = Any


def depthwise_conv_transpose(x, kernel, bias, sr):
    """Non-overlapping depthwise ConvTranspose2d(k=sr, stride=sr, groups=C)
    (edgevit.py:68): each input pixel expands to an sr x sr patch weighted by
    its channel's kernel — a pure einsum + reshape on TPU."""
    b, h, w, c = x.shape
    y = jnp.einsum("bhwc,ijc->bhiwjc", x, kernel)
    y = y.reshape(b, h * sr, w * sr, c)
    return y + bias


class GlobalSparseAttn(nn.Module):
    """edgevit.py:50-99."""
    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int):          # x: [B, N, C]
        b, n, c = x.shape
        sr = self.sr_ratio
        if sr > 1:
            x = x.reshape(b, h, w, c)[:, ::sr, ::sr, :]   # AvgPool2d(1, sr)
            x = x.reshape(b, (h // sr) * (w // sr), c)
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, -1, 3, self.num_heads, hd)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, -1)
        x = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        x = jnp.moveaxis(x, 1, 2).reshape(b, -1, c)
        if sr > 1:
            kernel = self.param("localprop_kernel",
                                nn.initializers.lecun_normal(),
                                (sr, sr, c), jnp.float32)
            bias = self.param("localprop_bias", nn.initializers.zeros,
                              (c,), jnp.float32)
            x = x.reshape(b, h // sr, w // sr, c)
            x = depthwise_conv_transpose(x, kernel.astype(x.dtype),
                                         bias.astype(x.dtype), sr)
            x = x.reshape(b, h * w, c)
            # plain nn.LayerNorm(dim) in the reference (edgevit.py:69) ->
            # torch default eps 1e-5, unlike the blocks' 1e-6 norm_layer
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(c, dtype=self.dtype, name="proj")(x)


class LocalAgg(nn.Module):
    """Conv attention (edgevit.py:102-120)."""
    dim: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):     # NHWC
        d = self.dim
        pos = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)],
                      feature_group_count=d, dtype=self.dtype,
                      name="pos_embed")(x)
        x = x + pos
        y = F32BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = nn.Conv(d, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = nn.Conv(d, (5, 5), padding=[(2, 2), (2, 2)],
                    feature_group_count=d, dtype=self.dtype, name="attn")(y)
        y = nn.Conv(d, (1, 1), dtype=self.dtype, name="conv2")(y)
        x = x + y
        y = F32BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Conv(int(d * self.mlp_ratio), (1, 1), dtype=self.dtype,
                    name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Conv(d, (1, 1), dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class SelfAttnBlock(nn.Module):
    """edgevit.py:123-148."""
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):     # NHWC
        del train
        d = self.dim
        pos = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)],
                      feature_group_count=d, dtype=self.dtype,
                      name="pos_embed")(x)
        x = x + pos
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        a = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(t)
        t = t + GlobalSparseAttn(d, self.num_heads, self.sr_ratio,
                                 dtype=self.dtype, name="attn")(a, h, w)
        m = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(t)
        m = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(m)
        m = jax.nn.gelu(m, approximate=False)
        m = nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(m)
        t = t + m
        return t.reshape(b, h, w, c)


class LGLBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.sr_ratio > 1:
            x = LocalAgg(self.dim, self.mlp_ratio, dtype=self.dtype,
                         name="local_agg")(x, train)
        return SelfAttnBlock(self.dim, self.num_heads, self.sr_ratio,
                             self.mlp_ratio, dtype=self.dtype,
                             name="self_attn")(x, train)


class EdgeViT(nn.Module):
    """edgevit.py:198-328; returns (feat2, feat3, feat4, feat5)."""
    depth: Sequence[int] = (1, 2, 5, 3)
    embed_dim: Sequence[int] = (48, 96, 240, 384)
    head_dim: int = 64
    sr_ratios: Sequence[int] = (4, 2, 2, 1)
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        heads = [max(d // self.head_dim, 1) for d in self.embed_dim]

        def patch_embed(x, dim, patch, name):
            x = nn.Conv(dim, (patch, patch), strides=patch, padding="VALID",
                        dtype=self.dtype, name=f"{name}_proj")(x)
            # PatchEmbed.norm is a plain nn.LayerNorm (edgevit.py:183) ->
            # torch default eps 1e-5
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name=f"{name}_norm")(x)

        feats = []
        for i in range(4):
            x = patch_embed(x, self.embed_dim[i], 4 if i == 0 else 2,
                            f"patch_embed{i + 1}")
            if i < 3:
                feats.append(x)
            for j in range(self.depth[i]):
                x = LGLBlock(self.embed_dim[i], heads[i], self.sr_ratios[i],
                             self.mlp_ratio, dtype=self.dtype,
                             name=f"blocks{i + 1}_{j}")(x, train)
        x = F32BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        feats.append(x)
        return tuple(feats)


def edgevit_xxs(**kw):
    """edgevit.py:332-338 (head_dim=20 -> heads [1,2,4,8])."""
    return EdgeViT(depth=(1, 1, 3, 2), embed_dim=(32, 48, 96, 176),
                   head_dim=20, **kw)


def edgevit_xs(**kw):
    return EdgeViT(depth=(1, 1, 3, 1), embed_dim=(32, 48, 120, 224),
                   head_dim=32, **kw)


def edgevit_s(**kw):
    return EdgeViT(depth=(1, 2, 5, 3), embed_dim=(32, 64, 144, 288),
                   head_dim=32, **kw)


EDGEVIT_VARIANTS = {"S0": edgevit_xxs, "S1": edgevit_xs, "S2": edgevit_s}
