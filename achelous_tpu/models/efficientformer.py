"""EfficientFormerV2 backbone (`ef`) — the reference's "ImageEncoder".

reference backbone/vision/ImageEncoder.py:63-683.  Hybrid conv + 4D attention
with learned relative-position bias tables, talking heads, stride-attention at
stage 2 and an attention-downsample embedding into stage 3.  The bias index
tables are static functions of the (compile-time) feature resolution, built in
numpy; biases are gathered per forward (the reference caches `ab` at eval —
under jit XLA constant-folds the gather, which is the same optimization).
NHWC throughout.
"""
from __future__ import annotations

import functools
import itertools
import math
from typing import Any, Optional, Sequence

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.ops.resize import resize_bilinear

Dtype = Any

# reference ImageEncoder.py:23-28 and :31-60
DEPTHS = {"L": (5, 5, 15, 10), "S2": (4, 4, 12, 8), "S1": (3, 3, 9, 6),
          "S0": (2, 2, 6, 4)}
EXPANSION_RATIOS = {
    "L": {0: [4, 4, 4, 4, 4], 1: [4, 4, 4, 4, 4],
          2: [4, 4, 4, 4, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4],
          3: [4, 4, 4, 3, 3, 3, 3, 4, 4, 4]},
    "S2": {0: [4, 4, 4, 4], 1: [4, 4, 4, 4],
           2: [4, 4, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4], 3: [4, 4, 3, 3, 3, 3, 4, 4]},
    "S1": {0: [4, 4, 4], 1: [4, 4, 4], 2: [4, 4, 3, 3, 3, 3, 4, 4, 4],
           3: [4, 4, 3, 3, 4, 4]},
    "S0": {0: [4, 4], 1: [4, 4], 2: [4, 3, 3, 3, 4, 4], 3: [4, 3, 3, 4]},
}
VIT_NUM = {"L": 6, "S2": 4, "S1": 2, "S0": 2}


@functools.lru_cache(maxsize=None)
def _bias_idxs_same(resolution: int) -> np.ndarray:
    """Attention4D bias index table [N, N] (ImageEncoder.py:108-121)."""
    points = list(itertools.product(range(resolution), range(resolution)))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


@functools.lru_cache(maxsize=None)
def _bias_idxs_down(resolution: int) -> np.ndarray:
    """Attention4DDownsample bias index table [N2, N] (:238-257)."""
    res2 = math.ceil(resolution / 2)
    points = list(itertools.product(range(resolution), range(resolution)))
    points_ = list(itertools.product(range(res2), range(res2)))
    offsets, idxs = {}, []
    k = math.ceil(resolution / res2)
    for p1 in points_:
        for p2 in points:
            off = (abs(p1[0] * k - p2[0]), abs(p1[1] * k - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return (np.asarray(idxs, np.int32).reshape(len(points_), len(points)),
            len(offsets))


def _conv_bn(x, feats, k, stride, groups, mod, train, name, use_bias=True):
    p = (k - 1) // 2
    x = nn.Conv(feats, (k, k), strides=stride, padding=[(p, p), (p, p)],
                feature_group_count=groups, use_bias=use_bias,
                dtype=mod.dtype, name=f"{name}_conv")(x)
    return F32BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=mod.dtype, name=f"{name}_bn")(x)


class Attention4D(nn.Module):
    """reference ImageEncoder.py:63-160."""
    dim: int
    key_dim: int = 32
    num_heads: int = 8
    attn_ratio: int = 4
    resolution: int = 7
    stride: Optional[int] = None
    use_pallas: Optional[bool] = None   # None = auto: on for TPU backends
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = self.resolution
        if self.stride is not None:
            res = math.ceil(self.resolution / self.stride)
            x = _conv_bn(x, self.dim, 3, self.stride, self.dim, self, train,
                         "stride")
        b = x.shape[0]
        n = res * res
        d = int(self.attn_ratio * self.key_dim)
        dh = d * self.num_heads
        nh_kd = self.key_dim * self.num_heads

        q = _conv_bn(x, nh_kd, 1, 1, 1, self, train, "q")
        k = _conv_bn(x, nh_kd, 1, 1, 1, self, train, "k")
        v = _conv_bn(x, dh, 1, 1, 1, self, train, "v")
        v_local = _conv_bn(v, dh, 3, 1, dh, self, train, "v_local")

        # NHWC [b, res, res, h*c] -> [b, h, N, c]
        def tokens(t, c):
            return t.reshape(b, n, self.num_heads, c).transpose(0, 2, 1, 3)

        qh = tokens(q, self.key_dim)
        kh = tokens(k, self.key_dim)
        vh = tokens(v, d)

        idxs, n_off = _bias_idxs_same(res)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_off), jnp.float32)
        bias = biases[:, jnp.asarray(idxs)]            # [h, N, N]
        th1 = self.param("talking_head1",
                         nn.initializers.lecun_normal(),
                         (self.num_heads, self.num_heads), jnp.float32)
        th1_b = self.param("talking_head1_bias", nn.initializers.zeros,
                           (self.num_heads,), jnp.float32)
        th2 = self.param("talking_head2",
                         nn.initializers.lecun_normal(),
                         (self.num_heads, self.num_heads), jnp.float32)
        th2_b = self.param("talking_head2_bias", nn.initializers.zeros,
                           (self.num_heads,), jnp.float32)
        from achelous_tpu.core.kernels import (interpret_default,
                                               pallas_default, shard_wrap)
        from achelous_tpu.ops.pallas_attention import (fused_bias_attention,
                                                       reference_bias_attention)
        use_pallas = self.use_pallas
        if use_pallas is None:   # auto: measured 19% faster in-context on v5e
            use_pallas = pallas_default(batch_size=b)
        scale = self.key_dim ** -0.5
        if use_pallas:
            interp = interpret_default()

            # scale/interpret are static argnames of the jitted kernel, so
            # they are closed over (shard_map would trace them); q/k/v are
            # batched, bias tables + talking heads replicated — run the
            # single-device kernel per mesh shard (core/kernels.shard_wrap)
            def attn_fn(q_, k_, v_, bias_, w1, b1, w2, b2):
                return fused_bias_attention(q_, k_, v_, bias_, w1, b1, w2,
                                            b2, scale, interpret=interp)

            attn_fn = shard_wrap(attn_fn, (True, True, True) + (False,) * 5)
            out = attn_fn(qh, kh, vh, bias.astype(x.dtype),
                          th1.astype(x.dtype), th1_b.astype(x.dtype),
                          th2.astype(x.dtype), th2_b.astype(x.dtype))
        else:
            out = reference_bias_attention(
                qh, kh, vh, bias.astype(x.dtype), th1.astype(x.dtype),
                th1_b.astype(x.dtype), th2.astype(x.dtype),
                th2_b.astype(x.dtype), scale)
        out = out.transpose(0, 2, 1, 3).reshape(b, res, res, dh) + v_local
        if self.stride is not None:
            out = resize_bilinear(out, (self.resolution, self.resolution),
                                  align_corners=False)
        out = jax.nn.gelu(out, approximate=False)
        return _conv_bn(out, self.dim, 1, 1, 1, self, train, "proj")


class Attention4DDownsample(nn.Module):
    """reference ImageEncoder.py:193-289 (+ LGQuery :174-190)."""
    dim: int
    out_dim: int
    resolution: int
    key_dim: int = 16
    num_heads: int = 8
    attn_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = self.resolution
        res2 = math.ceil(res / 2)
        b = x.shape[0]
        n, n2 = res * res, res2 * res2
        d = int(self.attn_ratio * self.key_dim)
        dh = d * self.num_heads
        nh_kd = self.key_dim * self.num_heads

        # LGQuery: stride-2 depthwise + stride-2 avgpool(1x1) + 1x1 proj
        local_q = nn.Conv(x.shape[-1], (3, 3), strides=2,
                          padding=[(1, 1), (1, 1)],
                          feature_group_count=x.shape[-1], use_bias=True,
                          dtype=self.dtype, name="q_local")(x)
        pool_q = x[:, ::2, ::2, :]
        q = _conv_bn(local_q + pool_q, nh_kd, 1, 1, 1, self, train, "q_proj")

        k = _conv_bn(x, nh_kd, 1, 1, 1, self, train, "k")
        v = _conv_bn(x, dh, 1, 1, 1, self, train, "v")
        v_local = _conv_bn(v, dh, 3, 2, dh, self, train, "v_local")

        qh = q.reshape(b, n2, self.num_heads, self.key_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(b, n, self.num_heads, self.key_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)

        idxs, n_off = _bias_idxs_down(res)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_off), jnp.float32)
        bias = biases[:, jnp.asarray(idxs)]            # [h, N2, N]
        attn = (jnp.einsum("bhnc,bhmc->bhnm", qh, kh) * (self.key_dim ** -0.5)
                + bias.astype(x.dtype))
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, res2, res2, dh) + v_local
        out = jax.nn.gelu(out, approximate=False)
        return _conv_bn(out, self.out_dim, 1, 1, 1, self, train, "proj")


class Mlp4D(nn.Module):
    """1x1-conv MLP with optional mid depthwise conv (ImageEncoder.py:342-389)."""
    hidden: int
    out: int
    mid_conv: bool = True
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = (lambda t: jax.nn.gelu(t, approximate=False)) \
            if self.act == "gelu" else jax.nn.relu
        x = _conv_bn(x, self.hidden, 1, 1, 1, self, train, "fc1")
        x = act(x)
        if self.mid_conv:
            x = _conv_bn(x, self.hidden, 3, 1, self.hidden, self, train, "mid")
            x = act(x)
        return _conv_bn(x, self.out, 1, 1, 1, self, train, "fc2")


class EFBlock(nn.Module):
    """FFN or AttnFFN block with layer scale 1e-5 (:392-449)."""
    dim: int
    mlp_ratio: float
    use_attn: bool
    resolution: int
    stride: Optional[int] = None
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_attn:
            ls1 = self.param("layer_scale_1",
                             nn.initializers.constant(1e-5), (self.dim,),
                             jnp.float32)
            attn_out = Attention4D(self.dim, resolution=self.resolution,
                                   stride=self.stride,
                                   use_pallas=self.use_pallas,
                                   dtype=self.dtype,
                                   name="token_mixer")(x, train)
            x = x + ls1.astype(x.dtype) * attn_out
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-5),
                         (self.dim,), jnp.float32)
        mlp_out = Mlp4D(int(self.dim * self.mlp_ratio), self.dim,
                        mid_conv=True, act="gelu", dtype=self.dtype,
                        name="mlp")(x, train)
        return x + ls2.astype(x.dtype) * mlp_out


class EfficientFormerV2(nn.Module):
    """4-stage assembly (ImageEncoder.py:488-612), fork_feat with per-stage
    output BatchNorm."""
    phi: str = "S0"
    resolution: int = 320
    use_pallas_attention: Optional[bool] = None   # None = auto (TPU on)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from achelous_tpu.core.config import WIDTHS
        dims = WIDTHS[self.phi]
        layers = DEPTHS[self.phi]
        e_ratios = EXPANSION_RATIOS[self.phi]
        vit_num = VIT_NUM[self.phi]

        # stem: two stride-2 conv+BN+ReLU (:163-171)
        x = _conv_bn(x, dims[0] // 2, 3, 2, 1, self, train, "stem0")
        x = jax.nn.gelu(x, approximate=False)
        x = _conv_bn(x, dims[0], 3, 2, 1, self, train, "stem1")
        x = jax.nn.gelu(x, approximate=False)

        feats = []
        for i in range(4):
            stage_res = math.ceil(self.resolution / (2 ** (i + 2)))
            for j in range(layers[i]):
                use_attn = i >= 2 and j > layers[i] - 1 - vit_num
                stride = 2 if (use_attn and i == 2) else None
                x = EFBlock(dims[i], mlp_ratio=e_ratios[i][j],
                            use_attn=use_attn, resolution=stage_res,
                            stride=stride,
                            use_pallas=self.use_pallas_attention,
                            dtype=self.dtype,
                            name=f"stage{i}_block{j}")(x, train)
            out = F32BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype,
                               name=f"norm_out{i}")(x)
            feats.append(out)
            if i < 3:
                # downsample embedding (:292-339): plain conv for 0->1, 1->2;
                # attention-downsample (asub) for 2->3
                if i >= 2:
                    attn = Attention4DDownsample(
                        dim=dims[i], out_dim=dims[i + 1],
                        resolution=stage_res, dtype=self.dtype,
                        name=f"embed{i}_attn")(x, train)
                    conv = _conv_bn(x, dims[i + 1], 3, 2, 1, self, train,
                                    f"embed{i}")
                    x = attn + conv
                else:
                    x = _conv_bn(x, dims[i + 1], 3, 2, 1, self, train,
                                 f"embed{i}")
        return tuple(feats)


def image_encoder_s0(resolution=320, **kw):
    return EfficientFormerV2(phi="S0", resolution=resolution, **kw)


def image_encoder_s1(resolution=320, **kw):
    return EfficientFormerV2(phi="S1", resolution=resolution, **kw)


def image_encoder_s2(resolution=320, **kw):
    return EfficientFormerV2(phi="S2", resolution=resolution, **kw)


def image_encoder_l(resolution=320, **kw):
    return EfficientFormerV2(phi="L", resolution=resolution, **kw)


EFORMER_VARIANTS = {"S0": image_encoder_s0, "S1": image_encoder_s1,
                    "S2": image_encoder_s2, "L": image_encoder_l}
