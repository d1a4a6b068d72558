"""FastViT backbone (`fv`, RDF-neck only) — RepMixer token mixing + ConvFFN +
reparam large-kernel downsampling (+ optional MHSA stages).

reference backbone/vision/fastvit_modules/fastvit.py:63-1016 and
modules/replknet.py:13-130.  The s0/s1/s2 variants used by Achelous are
all-repmixer; AttentionBlock/RepCPE are implemented for the sa-family
completeness.  fork_feat: 4 stage outputs, each through a BatchNorm.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp

from achelous_tpu.ops.mobileone_block import MobileOneBlock

Dtype = Any


def _bn(x, mod, train, name):
    return F32BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=mod.dtype, name=name)(x)


class ReparamLargeKernelConv(nn.Module):
    """replknet.py:13-130: large-kernel conv+BN + small-kernel conv+BN.

    NB: the reference's forward calls ``self.activation(out)`` but DISCARDS
    the result (replknet.py:88 — GELU is not in-place), so the block is
    effectively linear.  Reproduced here so transplanted reference weights
    forward identically.
    """
    features: int
    kernel_size: int
    stride: int
    groups: int
    small_kernel: int = 3
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, sk = self.kernel_size, self.small_kernel
        p, sp = k // 2, sk // 2
        if self.deploy:
            return nn.Conv(self.features, (k, k), strides=self.stride,
                           padding=[(p, p), (p, p)],
                           feature_group_count=self.groups, use_bias=True,
                           dtype=self.dtype, name="lkb_reparam")(x)
        big = nn.Conv(self.features, (k, k), strides=self.stride,
                      padding=[(p, p), (p, p)],
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, name="lkb_origin_conv")(x)
        big = _bn(big, self, train, "lkb_origin_bn")
        small = nn.Conv(self.features, (sk, sk), strides=self.stride,
                        padding=[(sp, sp), (sp, sp)],
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="small_conv")(x)
        small = _bn(small, self, train, "small_bn")
        return big + small


class RepMixer(nn.Module):
    """fastvit.py:228-347: x + ls * (mixer(x) - norm(x)); deploy: one dwconv."""
    dim: int
    kernel_size: int = 3
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        if self.deploy:
            p = k // 2
            return nn.Conv(self.dim, (k, k), padding=[(p, p), (p, p)],
                           feature_group_count=self.dim, use_bias=True,
                           dtype=self.dtype, name="reparam_conv")(x)
        norm = MobileOneBlock(self.dim, k, groups=self.dim, use_act=False,
                              use_scale_branch=False, num_conv_branches=0,
                              dtype=self.dtype, name="norm")(x, train)
        mixer = MobileOneBlock(self.dim, k, groups=self.dim, use_act=False,
                               dtype=self.dtype, name="mixer")(x, train)
        ls = self.param("layer_scale", nn.initializers.constant(1e-5),
                        (self.dim,), jnp.float32)
        return x + ls.astype(x.dtype) * (mixer - norm)


class ConvFFN(nn.Module):
    """fastvit.py:348-403: dw7x7+BN, 1x1 expand, GELU, 1x1 project."""
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        y = nn.Conv(self.out, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=cin, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        y = _bn(y, self, train, "conv_bn")
        y = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Conv(self.out, (1, 1), dtype=self.dtype, name="fc2")(y)


class MHSA(nn.Module):
    """fastvit.py:113-172 (head_dim 32, no qkv bias)."""
    dim: int
    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = c // self.head_dim
        t = x.reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype,
                       name="qkv")(t)
        qkv = qkv.reshape(b, -1, 3, heads, self.head_dim)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (self.head_dim ** -0.5), k)
        attn = jax.nn.softmax(attn, -1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = jnp.moveaxis(o, 1, 2).reshape(b, h * w, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        return o.reshape(b, h, w, c)


class RepCPE(nn.Module):
    """Conditional positional encoding, reparameterizable (fastvit.py:406-519)."""
    dim: int
    spatial: int = 7
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        p = self.spatial // 2
        pe = nn.Conv(self.dim, (self.spatial, self.spatial),
                     padding=[(p, p), (p, p)], feature_group_count=self.dim,
                     use_bias=True, dtype=self.dtype,
                     name="reparam_conv" if self.deploy else "pe")(x)
        return pe if self.deploy else pe + x


class RepMixerBlock(nn.Module):
    """fastvit.py:520-591."""
    dim: int
    mlp_ratio: float
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = RepMixer(self.dim, deploy=self.deploy, dtype=self.dtype,
                     name="token_mixer")(x, train)
        ls = self.param("layer_scale", nn.initializers.constant(1e-5),
                        (self.dim,), jnp.float32)
        ffn = ConvFFN(int(self.dim * self.mlp_ratio), self.dim,
                      dtype=self.dtype, name="convffn")(x, train)
        return x + ls.astype(x.dtype) * ffn


class AttentionBlock(nn.Module):
    """fastvit.py:594-663."""
    dim: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-5),
                         (self.dim,), jnp.float32)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-5),
                         (self.dim,), jnp.float32)
        y = _bn(x, self, train, "norm")
        x = x + ls1.astype(x.dtype) * MHSA(self.dim, dtype=self.dtype,
                                           name="token_mixer")(y)
        ffn = ConvFFN(int(self.dim * self.mlp_ratio), self.dim,
                      dtype=self.dtype, name="convffn")(x, train)
        return x + ls2.astype(x.dtype) * ffn


class FastViT(nn.Module):
    """fastvit.py:742-948 with fork_feat=True."""
    layers: Sequence[int]
    embed_dims: Sequence[int]
    mlp_ratios: Sequence[float]
    token_mixers: Sequence[str] = ("repmixer",) * 4
    pos_embs: Sequence[bool] = (False, False, False, False)
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        # conv stem: 3 MobileOne blocks (fastvit.py:63-110)
        x = MobileOneBlock(self.embed_dims[0], 3, stride=2, act="gelu", deploy=self.deploy,
                           dtype=self.dtype, name="stem0")(x, train)
        x = MobileOneBlock(self.embed_dims[0], 3, stride=2,
                           groups=self.embed_dims[0], act="gelu",
                           deploy=self.deploy,
                           dtype=self.dtype, name="stem1")(x, train)
        x = MobileOneBlock(self.embed_dims[0], 1, act="gelu", deploy=self.deploy,
                           dtype=self.dtype, name="stem2")(x, train)
        feats = []
        for i in range(4):
            if self.pos_embs[i]:
                x = RepCPE(self.embed_dims[i], deploy=self.deploy,
                           dtype=self.dtype, name=f"pos_emb{i}")(x, train)
            for j in range(self.layers[i]):
                if self.token_mixers[i] == "repmixer":
                    x = RepMixerBlock(self.embed_dims[i], self.mlp_ratios[i],
                                      deploy=self.deploy, dtype=self.dtype,
                                      name=f"stage{i}_block{j}")(x, train)
                else:
                    x = AttentionBlock(self.embed_dims[i], self.mlp_ratios[i],
                                       dtype=self.dtype,
                                       name=f"stage{i}_block{j}")(x, train)
            feats.append(_bn(x, self, train, f"norm_out{i}"))
            if i < 3:
                # PatchEmbed: ReparamLargeKernelConv(7, s2, groups=8) +
                # MobileOneBlock 1x1 (fastvit.py:175-226)
                x = ReparamLargeKernelConv(self.embed_dims[i + 1], 7, 2,
                                           groups=8, small_kernel=3,
                                           deploy=self.deploy,
                                           dtype=self.dtype,
                                           name=f"embed{i}_lk")(x, train)
                x = MobileOneBlock(self.embed_dims[i + 1], 1, act="gelu",
                                   deploy=self.deploy, dtype=self.dtype,
                                   name=f"embed{i}_pw")(x, train)
        return tuple(feats)


def fastvit_s0(**kw):
    """fastvit.py:957-975 (FastViT-T8)."""
    return FastViT(layers=(2, 2, 4, 2), embed_dims=(32, 48, 96, 176),
                   mlp_ratios=(3, 3, 3, 3), **kw)


def fastvit_s1(**kw):
    return FastViT(layers=(2, 2, 6, 2), embed_dims=(32, 48, 120, 224),
                   mlp_ratios=(3, 3, 3, 3), **kw)


def fastvit_s2(**kw):
    return FastViT(layers=(2, 2, 6, 2), embed_dims=(32, 64, 144, 288),
                   mlp_ratios=(4, 4, 4, 4), **kw)


FASTVIT_VARIANTS = {"S0": fastvit_s0, "S1": fastvit_s1, "S2": fastvit_s2}
