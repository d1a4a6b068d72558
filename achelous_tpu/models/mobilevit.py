"""MobileViT backbone (`mv`) — MV2 inverted residuals + MobileViT blocks
(unfold to patch grid -> transformer -> fold + conv fuse).

reference backbone/vision/mobilevit_modules/mobilevit.py:7-240.  NHWC; the
patch unfold is a reshape/transpose pair and attention is batched over the
(ph*pw) patch positions exactly like the reference's einops rearrange
'b d (h ph) (w pw) -> b (ph pw) (h w) d'.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp

Dtype = Any


def _conv_bn_silu(x, feats, k, stride, name_prefix, mod, train):
    p = 1 if k == 3 else 0
    x = nn.Conv(feats, (k, k), strides=stride, padding=[(p, p), (p, p)],
                use_bias=False, dtype=mod.dtype,
                name=f"{name_prefix}_conv")(x)
    x = F32BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=mod.dtype, name=f"{name_prefix}_bn")(x)
    return jax.nn.silu(x)


class MV2Block(nn.Module):
    """Inverted residual (mobilevit.py:93-131)."""
    oup: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = int(inp * self.expansion)
        res = x
        y = x
        if self.expansion != 1:
            y = _conv_bn_silu(y, hidden, 1, 1, "pw", self, train)
        y = nn.Conv(hidden, (3, 3), strides=self.stride,
                    padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = F32BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="dw_bn")(y)
        y = jax.nn.silu(y)
        y = nn.Conv(self.oup, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pwl_conv")(y)
        y = F32BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="pwl_bn")(y)
        if self.stride == 1 and inp == self.oup:
            y = y + res
        return y


class TransformerBlock(nn.Module):
    """Pre-norm MHSA + FFN over [B, P, N, D] (mobilevit.py:48-90)."""
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, p, n, d = x.shape
        inner = self.heads * self.dim_head
        # torch nn.LayerNorm default eps (1e-5); flax defaults to 1e-6
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(h)
        qkv = qkv.reshape(b, p, n, 3, self.heads, self.dim_head)
        q, k, v = [jnp.moveaxis(qkv[..., i, :, :], -2, 2)
                   for i in range(3)]                      # [B,P,h,N,dh]
        attn = jnp.einsum("bphnd,bphmd->bphnm", q, k) * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum("bphnm,bphmd->bphnd", attn, v)
        out = jnp.moveaxis(out, 2, -2).reshape(b, p, n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        x = x + out
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="ff1")(h)
        h = jax.nn.silu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ff2")(h)
        return x + h


class _TransformerScanBody(nn.Module):
    """nn.scan body: one remat'd TransformerBlock per scan step."""
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        x = nn.remat(TransformerBlock)(
            self.dim, heads=self.heads, dim_head=self.dim_head,
            mlp_dim=self.mlp_dim, dtype=self.dtype, name="block")(x)
        return x, None


class MobileViTBlock(nn.Module):
    """mobilevit.py:134-165: local conv, project to dim, per-patch-position
    global attention, project back, concat with input, fuse conv."""
    dim: int
    depth: int
    kernel_size: int = 3
    patch_size: Tuple[int, int] = (2, 2)
    mlp_dim: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channel = x.shape[-1]
        ph, pw = self.patch_size
        y = x
        x = _conv_bn_silu(x, channel, self.kernel_size, 1, "conv1", self, train)
        x = _conv_bn_silu(x, self.dim, 1, 1, "conv2", self, train)

        b, hh, ww, d = x.shape
        h, w = hh // ph, ww // pw
        # 'b (h ph) (w pw) d -> b (ph pw) (h w) d'
        x = x.reshape(b, h, ph, w, pw, d)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, ph * pw, h * w, d)
        # remat: the stored [B, P, heads, N, N] attention probabilities are
        # the dominant train-memory term at 320² (bs=32 OOM'd one v5e);
        # recomputing them in backward costs a rounding error of the FLOPs.
        # scan over depth: ONE traced block body instead of `depth`
        # unrolled copies — the unrolled MV-S1 train step at bs=32
        # exceeded the remote-compile helper's graph-size limit
        # (ARCHITECTURE.md).  Params gain a leading [depth] axis under
        # 'transformer/block'; the torch transplant mapping writes each
        # reference layer into its slice (utils/torch_import.py stacked
        # entries).
        ScanTB = nn.scan(_TransformerScanBody,
                         variable_axes={"params": 0},
                         split_rngs={"params": True},
                         length=self.depth)
        x, _ = ScanTB(self.dim, heads=4, dim_head=8,
                      mlp_dim=self.mlp_dim, dtype=self.dtype,
                      name="transformer")(x, None)
        x = x.reshape(b, ph, pw, h, w, d)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(b, hh, ww, d)

        x = _conv_bn_silu(x, channel, 1, 1, "conv3", self, train)
        x = jnp.concatenate([x, y], axis=-1)
        return _conv_bn_silu(x, channel, self.kernel_size, 1, "conv4",
                             self, train)


class MobileViT(nn.Module):
    """mobilevit.py:168-222; returns feats at strides 4/8/16/32."""
    dims: Sequence[int]
    channels: Sequence[int]
    expansion: int = 4
    kernel_size: int = 3
    patch_size: Tuple[int, int] = (2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        d = self.dims
        L = (2, 4, 3)
        x = _conv_bn_silu(x, c[0], 3, 2, "conv1", self, train)
        x = MV2Block(c[1], 1, self.expansion, dtype=self.dtype,
                     name="mv2_0")(x, train)
        x = MV2Block(c[2], 2, self.expansion, dtype=self.dtype,
                     name="mv2_1")(x, train)
        x = MV2Block(c[3], 1, self.expansion, dtype=self.dtype,
                     name="mv2_2")(x, train)
        x = MV2Block(c[3], 1, self.expansion, dtype=self.dtype,
                     name="mv2_3")(x, train)
        feat2 = x
        x = MV2Block(c[4], 2, self.expansion, dtype=self.dtype,
                     name="mv2_4")(x, train)
        x = MobileViTBlock(d[0], L[0], self.kernel_size, self.patch_size,
                           int(d[0] * 2), dtype=self.dtype,
                           name="mvit_0")(x, train)
        feat3 = x
        x = MV2Block(c[6], 2, self.expansion, dtype=self.dtype,
                     name="mv2_5")(x, train)
        x = MobileViTBlock(d[1], L[1], self.kernel_size, self.patch_size,
                           int(d[1] * 4), dtype=self.dtype,
                           name="mvit_1")(x, train)
        feat4 = x
        x = MV2Block(c[8], 2, self.expansion, dtype=self.dtype,
                     name="mv2_6")(x, train)
        x = MobileViTBlock(d[2], L[2], self.kernel_size, self.patch_size,
                           int(d[2] * 4), dtype=self.dtype,
                           name="mvit_2")(x, train)
        x = _conv_bn_silu(x, c[10], 1, 1, "conv2", self, train)
        feat5 = x
        return feat2, feat3, feat4, feat5


def mobilevit_xxs(**kw):
    """mobilevit.py:225-228 (expansion=2)."""
    return MobileViT(dims=(64, 80, 96),
                     channels=(16, 16, 32, 32, 48, 48, 96, 96, 96, 96, 176),
                     expansion=2, **kw)


def mobilevit_xs(**kw):
    return MobileViT(dims=(96, 120, 144),
                     channels=(16, 32, 32, 32, 48, 48, 120, 120, 120, 120, 224),
                     **kw)


def mobilevit_s(**kw):
    return MobileViT(dims=(144, 192, 240),
                     channels=(16, 32, 32, 32, 64, 64, 144, 144, 144, 144, 288),
                     **kw)


MOBILEVIT_VARIANTS = {"S0": mobilevit_xxs, "S1": mobilevit_xs,
                      "S2": mobilevit_s}
