"""Modulated deformable convolution (DCNv2) for TPU.

Replaces `torchvision.ops.deform_conv2d` (reference backbone/conv_utils/
dcn.py:56-63).  Formulated TPU-first: the data-dependent part is a batched
bilinear gather of K taps per output pixel; the contraction over
(taps x in-channels) is a single [B*Ho*Wo, K*C] x [K*C, Cout] matmul that XLA
places on the MXU.  Offsets/modulators are zero-initialized (dcn.py:29-40) so
at init this is exactly a standard conv with x1 modulation.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample x[B,H,W,C] at float coords (ys, xs) of shape [B, P].

    Out-of-bounds samples contribute zero (torchvision deform_conv semantics).
    Returns [B, P, C].
    """
    b, h, w, c = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = x.reshape(b, h * w, c)

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * (wgt * valid.astype(x.dtype))[..., None]

    out = (corner(y0i, x0i, (1 - wy1) * (1 - wx1))
           + corner(y0i, x0i + 1, (1 - wy1) * wx1)
           + corner(y0i + 1, x0i, wy1 * (1 - wx1))
           + corner(y0i + 1, x0i + 1, wy1 * wx1))
    return out


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                  stride: int = 1, padding: int = 1) -> jnp.ndarray:
    """Modulated deformable conv.

    Args:
      x:      [B, H, W, C] input.
      offset: [B, Ho, Wo, 2K] per-tap (dy, dx) interleaved, torchvision layout.
      mask:   [B, Ho, Wo, K] modulation scalars.
      weight: [kh, kw, C, Cout].
      bias:   [Cout] or None.
    """
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    _, ho, wo, _ = offset.shape

    # base sampling grid: out position * stride - pad + tap offset
    ys_out = jnp.arange(ho, dtype=x.dtype) * stride - padding
    xs_out = jnp.arange(wo, dtype=x.dtype) * stride - padding
    tap_y = jnp.arange(kh, dtype=x.dtype)
    tap_x = jnp.arange(kw, dtype=x.dtype)
    # [Ho, Wo, kh, kw]
    base_y = ys_out[:, None, None, None] + tap_y[None, None, :, None]
    base_x = xs_out[None, :, None, None] + tap_x[None, None, None, :]
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(1, ho, wo, k)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(1, ho, wo, k)

    off = offset.reshape(b, ho, wo, k, 2)
    ys = (base_y + off[..., 0]).reshape(b, ho * wo * k)
    xs = (base_x + off[..., 1]).reshape(b, ho * wo * k)

    samples = bilinear_gather(x, ys, xs)                    # [B, Ho*Wo*K, C]
    samples = samples.reshape(b, ho, wo, k, c)
    samples = samples * mask[..., None]
    samples = samples.reshape(b, ho, wo, k * c)

    wmat = weight.reshape(k * c, cout)                      # (kh*kw, C) -> rows
    # weight layout: [kh, kw, C, Cout] flattened row-major matches samples'
    # [K (kh-major), C] flattening.
    out = jnp.einsum("bhwi,io->bhwo", samples, wmat)
    if bias is not None:
        out = out + bias
    return out


class DeformableConv2d(nn.Module):
    """reference backbone/conv_utils/dcn.py:6-64.

    Offset and modulator convs are zero-initialized (weights and biases) so
    training starts from plain-conv behavior; modulator is 2*sigmoid(.).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    remat: bool = True        # recompute the bilinear gather in backward:
                              # its [B, Ho*Wo*K, C] corner temporaries are
                              # the largest HLO-temp allocations of the whole
                              # train step (OOM at bs=32 on one v5e without
                              # this), while RCNet is a rounding error of the
                              # forward FLOPs — the canonical remat trade
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh = kw = self.kernel_size
        k = kh * kw
        p = self.padding
        offset = nn.Conv(2 * k, (kh, kw), strides=self.stride,
                         padding=[(p, p), (p, p)],
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         dtype=self.dtype, name="offset_conv")(x)
        modulator = 2.0 * jax.nn.sigmoid(
            nn.Conv(k, (kh, kw), strides=self.stride, padding=[(p, p), (p, p)],
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="modulator_conv")(x))
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        fn = deform_conv2d
        if self.remat:
            fn = jax.checkpoint(deform_conv2d, static_argnums=(5, 6))
        return fn(x, offset, modulator,
                  weight.astype(self.dtype),
                  None if bias is None else bias.astype(self.dtype),
                  self.stride, self.padding)
