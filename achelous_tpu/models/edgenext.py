"""EdgeNeXt backbone (`en`) — ConvNeXt-style conv encoders + SDTA blocks with
XCA cross-covariance attention.

TPU-native reimplementation of reference backbone/vision/edgenext_modules/
(edgenext.py:9-92, conv_encoder.py:7-32, sdta_encoder.py:8-74,151-189,
layers.py:7-59, model.py:13-66).  NHWC layout; attention over channel
covariance (d x d, d = C/heads <= 72) which is tiny and MXU-friendly.
Returns 4 feature maps at strides 4/8/16/32.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

LN_EPS = 1e-6  # reference edgenext.py:26,31,56


@functools.lru_cache(maxsize=None)
def _fourier_pos_table(h: int, w: int, hidden_dim: int = 32,
                       temperature: float = 10000.0) -> np.ndarray:
    """Static sinusoidal table [h, w, 2*hidden_dim].

    reference layers.py:29-59 (PositionalEncodingFourier before the learned
    1x1 projection).  Shapes are static under jit so this is a compile-time
    constant.
    """
    scale = 2 * math.pi
    eps = 1e-6
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] / (h + eps) * scale
    x = np.arange(1, w + 1, dtype=np.float64)[None, :] / (w + eps) * scale
    y = np.broadcast_to(y, (h, w))
    x = np.broadcast_to(x, (h, w))
    dim_t = np.arange(hidden_dim, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / hidden_dim)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    # interleave sin(even) / cos(odd) pairs (reference layers.py:52-55)
    px = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])],
                  axis=-1).reshape(h, w, -1)
    py = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])],
                  axis=-1).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1).astype(np.float32)


class PositionalEncodingFourier(nn.Module):
    """Learned 1x1 projection of the static Fourier table (layers.py:29-59)."""
    dim: int
    hidden_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        table = jnp.asarray(_fourier_pos_table(h, w, self.hidden_dim),
                            dtype=self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype,
                        name="token_projection")(table)   # [h, w, dim]


class ConvEncoder(nn.Module):
    """ConvNeXt-ish block (reference conv_encoder.py:7-32): depthwise k x k,
    LN, 1x1 expand (x4), GELU, 1x1 project, layer-scale, residual."""
    dim: int
    expan_ratio: int = 4
    kernel_size: int = 7
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        p = self.kernel_size // 2
        x = nn.Conv(self.dim, (self.kernel_size, self.kernel_size),
                    padding=[(p, p), (p, p)], feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.expan_ratio * self.dim, dtype=self.dtype,
                     name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init_value),
                           (self.dim,), jnp.float32)
        return inp + gamma.astype(x.dtype) * x


class XCA(nn.Module):
    """Cross-covariance attention (reference sdta_encoder.py:151-189).

    Attention over the channel-covariance matrix: q,k,v are [B, h, d, N] with
    q/k L2-normalized along N; attn is [B, h, d, d] — tiny matmuls that XLA
    keeps entirely in registers/VMEM.
    """
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):          # x: [B, N, C]
        b, n, c = x.shape
        d = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, d)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, -1) for i in range(3)]  # [B,h,d,N]

        def l2norm(t):
            return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True),
                                   1e-12)
        q, k = l2norm(q), l2norm(k)
        temp = self.param("temperature", nn.initializers.ones,
                          (self.num_heads, 1, 1), jnp.float32)
        attn = jnp.einsum("bhdn,bhen->bhde", q, k) * temp.astype(x.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)        # [B,h,d,N]
        out = jnp.moveaxis(out, -1, 1).reshape(b, n, c)     # [B,N,h*d]
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SDTAEncoder(nn.Module):
    """Split-depthwise-transpose-attention block (sdta_encoder.py:8-74).

    Multi-scale cascaded depthwise 3x3 over channel splits, then XCA with
    layer-scale, then an inverted-bottleneck MLP; single outer residual.
    """
    dim: int
    expan_ratio: int = 4
    scales: int = 1
    use_pos_emb: bool = False
    num_heads: int = 8
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):          # x: [B, H, W, C]
        b, h, w, c = x.shape
        inp = x
        width = max(math.ceil(self.dim / self.scales),
                    math.floor(self.dim // self.scales))
        nums = 1 if self.scales == 1 else self.scales - 1

        # cascaded depthwise convs over channel splits (lines 42-53)
        splits = [x[..., i * width:(i + 1) * width]
                  for i in range(math.ceil(c / width))]
        outs = []
        sp = None
        for i in range(nums):
            sp = splits[i] if i == 0 else sp + splits[i]
            sp = nn.Conv(sp.shape[-1], (3, 3), padding=[(1, 1), (1, 1)],
                         feature_group_count=sp.shape[-1], dtype=self.dtype,
                         name=f"convs_{i}")(sp)
            outs.append(sp)
        outs.extend(splits[nums:])
        x = jnp.concatenate(outs, axis=-1)

        # XCA over tokens (lines 54-61)
        t = x.reshape(b, h * w, c)
        if self.use_pos_emb:
            pos = PositionalEncodingFourier(dim=self.dim, dtype=self.dtype,
                                            name="pos_embd")(h, w)
            t = t + pos.reshape(1, h * w, c)
        gamma_xca = self.param("gamma_xca",
                               nn.initializers.constant(self.layer_scale_init_value),
                               (self.dim,), jnp.float32)
        xca_out = XCA(self.dim, num_heads=self.num_heads, dtype=self.dtype,
                      name="xca")(
            nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm_xca")(t))
        t = t + gamma_xca.astype(t.dtype) * xca_out
        x = t.reshape(b, h, w, c)

        # inverted bottleneck (lines 63-69) — no inner residual
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.expan_ratio * self.dim, dtype=self.dtype,
                     name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init_value),
                           (self.dim,), jnp.float32)
        return inp + gamma.astype(x.dtype) * x


class EdgeNeXt(nn.Module):
    """4-stage EdgeNeXt (reference edgenext.py:9-92), NHWC.

    Returns the 4 stage outputs at strides 4/8/16/32
    (reference forward_features, edgenext.py:73-86).
    """
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (24, 48, 88, 168)
    global_block: Sequence[int] = (0, 0, 0, 3)
    expan_ratio: int = 4
    kernel_sizes: Sequence[int] = (7, 7, 7, 7)
    heads: Sequence[int] = (8, 8, 8, 8)
    use_pos_embd_xca: Sequence[bool] = (False, False, False, False)
    d2_scales: Sequence[int] = (2, 3, 4, 5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        del train  # no BN; LN only
        feats = []
        for i in range(4):
            if i == 0:
                # stem: 4x4 stride-4 conv + LN (edgenext.py:24-27)
                x = nn.Conv(self.dims[0], (4, 4), strides=4, padding="VALID",
                            dtype=self.dtype, name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                 name="stem_norm")(x)
            else:
                # LN + 2x2 stride-2 conv (edgenext.py:29-34)
                x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                 name=f"down_norm_{i}")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_conv_{i}")(x)
            for j in range(self.depths[i]):
                if j > self.depths[i] - self.global_block[i] - 1:
                    x = SDTAEncoder(dim=self.dims[i],
                                    expan_ratio=self.expan_ratio,
                                    scales=self.d2_scales[i],
                                    use_pos_emb=self.use_pos_embd_xca[i],
                                    num_heads=self.heads[i], dtype=self.dtype,
                                    name=f"stage{i}_sdta{j}")(x)
                else:
                    x = ConvEncoder(dim=self.dims[i],
                                    expan_ratio=self.expan_ratio,
                                    kernel_size=self.kernel_sizes[i],
                                    dtype=self.dtype,
                                    name=f"stage{i}_conv{j}")(x)
            feats.append(x)
        return tuple(feats)


def _en(depths, dims, heads, **kw):
    return EdgeNeXt(depths=depths, dims=dims, expan_ratio=4,
                    global_block=(0, 1, 1, 1),
                    use_pos_embd_xca=(False, True, False, False),
                    kernel_sizes=(3, 5, 7, 9), heads=heads,
                    d2_scales=(2, 2, 3, 4), **kw)


def edgenext_xx_small(**kw):
    """S0 — reference model.py:14-29 (1.33M params)."""
    return _en((2, 2, 6, 2), (32, 48, 96, 176), (4, 4, 4, 4), **kw)


def edgenext_x_small(**kw):
    """S1 — reference model.py:33-48 (2.34M params)."""
    return _en((3, 3, 9, 3), (32, 48, 120, 224), (4, 4, 4, 4), **kw)


def edgenext_small(**kw):
    """S2 — reference model.py:52-66 (5.59M params; default 8 heads)."""
    return _en((3, 3, 9, 3), (32, 64, 144, 288), (8, 8, 8, 8), **kw)


EDGENEXT_VARIANTS = {"S0": edgenext_xx_small, "S1": edgenext_x_small,
                     "S2": edgenext_small}
