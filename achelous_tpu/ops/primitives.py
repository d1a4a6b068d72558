"""Conv / norm / attention building blocks (NHWC, Flax linen).

TPU-first re-expression of the reference primitives:
  - BaseConv / DWConv          reference backbone/conv_utils/normal_conv.py:23-53
  - GhostModule / Bottleneck   reference backbone/conv_utils/ghost_conv.py:6-70
  - SPP / SPPF                 reference neck/spp.py:41-68
  - eca_block                  reference backbone/attention_modules/eca.py:6-22
  - ShuffleAttention           reference backbone/attention_modules/shuffle_attention.py:8-72
  - Upsample                   reference neck/ghostdualfpn.py:28-39

Everything is NHWC so XLA tiles convs directly onto the MXU; BN statistics are
carried in the standard flax `batch_stats` collection.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp

from achelous_tpu.ops.resize import upsample2x

Dtype = Any


class DepthwiseConvFMA(nn.Module):
    """Stride-1 SAME depthwise conv with nn.Conv's exact param tree
    ({kernel [k,k,1,features]}, lecun_normal, no bias) but computed as
    unrolled shift-FMAs below the channel cap (ops/smallconv.py): at the
    seg decoders' full-res tier XLA lowered these trivial depthwise 3x3s
    into 7-operand "convolution fusions" bracketed by relayout copies
    (r5 bs=1 trace: ~0.3 ms/frame across the four cheap_convs)."""
    features: int
    ksize: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.ksize
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, 1, self.features), jnp.float32)
        from achelous_tpu.ops.smallconv import dw_fma_ok, dwconv_nhwc_fma
        if dw_fma_ok(self.features):
            return dwconv_nhwc_fma(x, kernel, None, self.dtype)
        p = k // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [(p, p), (p, p)], feature_group_count=x.shape[-1],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def act_fn(name: str | None):
    """reference backbone/conv_utils/normal_conv.py:11-20 (+ gelu/hswish)."""
    if name is None or name == "none":
        return lambda x: x
    return {
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, 0.1),
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "hswish": jax.nn.hard_swish,
        "sigmoid": jax.nn.sigmoid,
    }[name]


def max_pool_same(x: jnp.ndarray, k: int, stride: int = 1) -> jnp.ndarray:
    """k x k max-pool, torch-style symmetric padding k//2."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(stride, stride),
                       padding=((p, p), (p, p)))


def avg_pool_same(x: jnp.ndarray, k: int, stride: int = 1) -> jnp.ndarray:
    """torch AvgPool2d(k, stride, padding=k//2) with count_include_pad=True."""
    p = k // 2
    return nn.avg_pool(x, (k, k), strides=(stride, stride),
                       padding=((p, p), (p, p)), count_include_pad=True)


class ConvBN(nn.Module):
    """Conv + BatchNorm + activation (reference BaseConv, normal_conv.py:36-52).

    With `ds_conv=True` the conv is a depthwise-separable pair
    (reference DWConv, normal_conv.py:23-33: depthwise k x k then pointwise 1x1).
    """
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: str = "relu"
    ds_conv: bool = False
    use_bias: bool = False
    bn_eps: float = 1e-3      # reference normal_conv.py:45 (eps=0.001)
    bn_momentum: float = 0.97  # torch momentum 0.03
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        if self.ds_conv:
            cin = x.shape[-1]
            x = nn.Conv(cin, (self.kernel, self.kernel),
                        strides=self.stride, padding=[(p, p), (p, p)],
                        feature_group_count=cin, use_bias=self.use_bias,
                        dtype=self.dtype, name="dconv")(x)
            x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                        dtype=self.dtype, name="pconv")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=self.stride, padding=[(p, p), (p, p)],
                        feature_group_count=self.groups, use_bias=self.use_bias,
                        dtype=self.dtype, name="conv")(x)
        x = F32BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=self.bn_eps, dtype=self.dtype, name="bn")(x)
        return act_fn(self.act)(x)


class YoloConv(nn.Module):
    """reference neck/spp.py:27-38 — conv + BN(1e-3, 0.03) + SiLU."""
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=[(p, p), (p, p)],
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = F32BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return jax.nn.silu(x)


class GhostModule(nn.Module):
    """reference backbone/conv_utils/ghost_conv.py:6-29.

    Primary conv to ceil(oup/ratio) channels, cheap depthwise conv for the
    rest, concat and slice to `oup`.
    """
    oup: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_ch = math.ceil(self.oup / self.ratio)
        new_ch = init_ch * (self.ratio - 1)
        act = act_fn("relu" if self.relu else "none")
        kp = self.kernel_size // 2
        x1 = nn.Conv(init_ch, (self.kernel_size, self.kernel_size),
                     strides=self.stride, padding=[(kp, kp), (kp, kp)],
                     use_bias=False, dtype=self.dtype, name="primary_conv")(x)
        x1 = F32BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="primary_bn")(x1)
        x1 = act(x1)
        x2 = DepthwiseConvFMA(new_ch, ksize=self.dw_size, dtype=self.dtype,
                              name="cheap_conv")(x1)
        x2 = F32BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="cheap_bn")(x2)
        x2 = act(x2)
        out = jnp.concatenate([x1, x2], axis=-1)
        return out[..., : self.oup]


class GhostBottleneck(nn.Module):
    """reference backbone/conv_utils/ghost_conv.py:32-70 (stride-1 variant used
    by the GDF neck; the shortcut projection appears whenever in != out)."""
    mid_chs: int
    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        residual = x
        y = GhostModule(self.mid_chs, relu=True, dtype=self.dtype,
                        name="ghost1")(x, train)
        if self.stride > 1:
            p = (self.dw_kernel_size - 1) // 2
            y = nn.Conv(self.mid_chs, (self.dw_kernel_size,) * 2,
                        strides=self.stride, padding=[(p, p), (p, p)],
                        feature_group_count=self.mid_chs, use_bias=False,
                        dtype=self.dtype, name="conv_dw")(y)
            y = F32BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn_dw")(y)
        y = GhostModule(self.out_chs, relu=False, dtype=self.dtype,
                        name="ghost2")(y, train)
        if in_chs == self.out_chs and self.stride == 1:
            sc = residual
        else:
            p = (self.dw_kernel_size - 1) // 2
            sc = nn.Conv(in_chs, (self.dw_kernel_size,) * 2, strides=self.stride,
                         padding=[(p, p), (p, p)], feature_group_count=in_chs,
                         use_bias=False, dtype=self.dtype, name="shortcut_dw")(residual)
            sc = F32BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype, name="shortcut_bn_dw")(sc)
            sc = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                         name="shortcut_pw")(sc)
            sc = F32BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype, name="shortcut_bn_pw")(sc)
        return y + sc


class SPP(nn.Module):
    """YOLOv3-SPP (reference neck/spp.py:41-52): 1x1 reduce, {5,9,13} maxpools,
    concat, 1x1 expand."""
    c2: int
    k: Sequence[int] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = YoloConv(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [max_pool_same(x, k) for k in self.k]
        x = jnp.concatenate([x] + pools, axis=-1)
        return YoloConv(self.c2, 1, dtype=self.dtype, name="cv2")(x, train)


class SPPF(nn.Module):
    """reference neck/spp.py:55-68 — serial 5x5 maxpools."""
    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = YoloConv(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool_same(x, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        x = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return YoloConv(self.c2, 1, dtype=self.dtype, name="cv2")(x, train)


class Upsample(nn.Module):
    """reference neck/ghostdualfpn.py:28-39 — 1x1 ConvBN(relu) then bilinear
    align-corners x2 (expressed as MXU matmuls, see ops/resize.py)."""
    features: int
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, 1, act="relu", dtype=self.dtype,
                   name="conv")(x, train)
        for _ in range(int(math.log2(self.scale))):
            x = upsample2x(x, align_corners=True)
        return x


class ECA(nn.Module):
    """Efficient channel attention (reference attention_modules/eca.py:6-22).

    Global average pool then a 1D conv *along the channel axis* with an
    adaptive odd kernel from log2(C).
    """
    b: int = 1
    gamma: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = int(abs((math.log(c, 2) + self.b) / self.gamma))
        k = k if k % 2 else k + 1
        pooled = jnp.mean(x, axis=(1, 2))          # [B, C]
        # 1D conv over the channel sequence, 1 in/out feature, no bias.
        p = (k - 1) // 2
        w = pooled[:, :, None]                      # [B, C(spatial), 1]
        w = nn.Conv(1, (k,), padding=[(p, p)], use_bias=False,
                    dtype=self.dtype, name="conv")(w)
        w = jax.nn.sigmoid(w[:, :, 0])              # [B, C]
        return x * w[:, None, None, :]


class ShuffleAttention(nn.Module):
    """reference attention_modules/shuffle_attention.py:8-72.

    Split channels into G groups; half of each group gets channel attention
    (global-pool scale) and half gets spatial attention (per-channel
    instance-norm scale); concat and shuffle with 2 groups.
    """
    G: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        c2g = c // (2 * self.G)
        xg = x.reshape(b, h, w, self.G, 2, c2g)
        x0 = xg[..., 0, :]   # [b,h,w,G,c2g] channel-attention half
        x1 = xg[..., 1, :]   # spatial-attention half

        cweight = self.param("cweight", nn.initializers.zeros, (c2g,), jnp.float32)
        cbias = self.param("cbias", nn.initializers.ones, (c2g,), jnp.float32)
        sweight = self.param("sweight", nn.initializers.zeros, (c2g,), jnp.float32)
        sbias = self.param("sbias", nn.initializers.ones, (c2g,), jnp.float32)
        gn_scale = self.param("gn_scale", nn.initializers.ones, (c2g,), jnp.float32)
        gn_bias = self.param("gn_bias", nn.initializers.zeros, (c2g,), jnp.float32)

        # channel attention: per-(group,channel) global mean
        s = jnp.mean(x0, axis=(1, 2), keepdims=True)
        s = cweight.astype(x.dtype) * s + cbias.astype(x.dtype)
        x0 = x0 * jax.nn.sigmoid(s)

        # spatial attention: GroupNorm with one channel per group == per-channel
        # instance norm over (h, w) (reference line 15: GroupNorm(C/2G, C/2G)).
        mu = jnp.mean(x1, axis=(1, 2), keepdims=True)
        var = jnp.var(x1, axis=(1, 2), keepdims=True)
        xn = (x1 - mu) * jax.lax.rsqrt(var + 1e-5)
        xn = gn_scale.astype(x.dtype) * xn + gn_bias.astype(x.dtype)
        xn = sweight.astype(x.dtype) * xn + sbias.astype(x.dtype)
        x1 = x1 * jax.nn.sigmoid(xn)

        out = jnp.concatenate([x0, x1], axis=-1)    # [b,h,w,G,2*c2g]
        out = out.reshape(b, h, w, c)
        # channel shuffle with 2 groups (reference lines 37-46, 71)
        out = out.reshape(b, h, w, 2, c // 2)
        out = jnp.swapaxes(out, -1, -2).reshape(b, h, w, c)
        return out
