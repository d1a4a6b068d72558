"""RCNet — Radar Convolution Network over the rasterized radar map.

reference backbone/radar/RadarEncoder.py:23-109.  8 RCBlocks (2 per stage);
every block runs an avg-pool + modulated deformable conv ("RadarConv"), a 1x1
conv + BN + ReLU residual, then a downsampling (stride-2 3x3) or 1x1 exit conv.
Features are tapped after blocks 3/5/7 at strides 8/16/32 with C/4 of the
image-encoder widths.

TPU layout: when the Pallas deform kernels are active, the whole encoder runs
CHANNELS-FIRST ([B,C,H,W]) — the kernels are CF internally (C as small as 3
would occupy 3/128 lanes in NHWC; [*,W] planes fill the lane axis), and
chaining the blocks CF removes the NHWC<->CF transpose pairs that bracketed
every kernel call (~12% of bs=1 frame time, TRACE_SUMMARY_BS1.txt).  One
transpose at entry, three at the s8/s16/s32 taps.  Param trees are identical
in both layouts, so checkpoints and torch transplants are layout-blind.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from achelous_tpu.core.config import WIDTHS
from achelous_tpu.ops.deform import DeformableConv2d
from achelous_tpu.ops.norm import F32BatchNorm

Dtype = Any


class CFConv(nn.Module):
    """Conv over a channels-first [B,C,H,W] tensor with nn.Conv's exact
    param names/shapes/inits ({kernel [kh,kw,cin,cout], bias [cout]},
    lecun_normal/zeros) so the CF and NHWC block paths share one tree."""
    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: int = 1
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        p = self.padding
        from achelous_tpu.ops.smallconv import cf_fma_ok, conv_cf_fma
        if cf_fma_ok(x.shape[1]):
            # tiny-channel CF conv: unrolled FMA avoids the relayout copies
            # XLA wraps around NCHW convs at these widths (ops/smallconv.py)
            return conv_cf_fma(x, kernel, bias, self.strides, p, self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (self.strides, self.strides), [(p, p), (p, p)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        return y + bias.astype(self.dtype)[:, None, None]


class RadarConv(nn.Module):
    """reference RadarEncoder.py:23-41 ('pool' first_calculator: 3x3 avg-pool
    stride 1, then 3x3 deformable conv).  The pool is owned by
    DeformableConv2d (input_pool=True) so the TPU path can fuse it into the
    Pallas RadarConv kernel (ops/pallas_deform.py)."""
    features: int
    band: int | None = None
    cf: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return DeformableConv2d(self.features, kernel_size=3, stride=1,
                                padding=1, use_bias=False, band=self.band,
                                input_pool=True, cf=self.cf, dtype=self.dtype,
                                name="deformable_conv")(x)


class RCBlock(nn.Module):
    """reference RadarEncoder.py:44-74."""
    features: int
    down: bool = False
    band: int | None = None
    cf: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cf = self.cf
        cin = x.shape[1] if cf else x.shape[-1]
        res = x
        y = RadarConv(cin, band=self.band, cf=cf, dtype=self.dtype,
                      name="radar_conv")(x)
        if cf:
            y = CFConv(cin, (1, 1), dtype=self.dtype,
                       name="weight_conv1")(y)
        else:
            y = nn.Conv(cin, (1, 1), use_bias=True, dtype=self.dtype,
                        name="weight_conv1")(y)
        y = F32BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis=1 if cf else -1,
                         dtype=self.dtype, name="norm")(y)
        y = nn.relu(y)
        y = res + y
        if cf:
            if self.down:
                y = CFConv(self.features, (3, 3), strides=2, padding=1,
                           dtype=self.dtype, name="weight_conv2")(y)
            else:
                y = CFConv(self.features, (1, 1), dtype=self.dtype,
                           name="weight_conv2")(y)
        elif self.down:
            y = nn.Conv(self.features, (3, 3), strides=2,
                        padding=[(1, 1), (1, 1)], use_bias=True,
                        dtype=self.dtype, name="weight_conv2")(y)
        else:
            y = nn.Conv(self.features, (1, 1), use_bias=True,
                        dtype=self.dtype, name="weight_conv2")(y)
        return y


class RCNet(nn.Module):
    """reference RadarEncoder.py:77-109.

    Returns (s8, s16, s32) NHWC features with widths[1..3]//4 channels.
    Internally channels-first whenever the Pallas kernels are active
    (`cf` None = auto); `cf` False forces the NHWC path (A/B measurement,
    tests).
    """
    phi: str = "S0"
    band: int | None = None     # deformable-conv banded fast path
                                # (AchelousConfig.deform_band, ops/deform.py)
    cf: bool | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, in_cf: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        from achelous_tpu.core.kernels import pallas_default
        cf = self.cf
        if cf is None:
            cf = (self.band is not None
                  and pallas_default(batch_size=x.shape[0]))
        widths = WIDTHS[self.phi]
        # block layout per reference ctor lines 84-94:
        #   i=0: (in -> w0/4, down), (w0/4 -> w0/4, down)
        #   i>0: (w[i-1]/4 -> w[i-1]/4), (w[i-1]/4 -> w[i]/4, down)
        specs = []
        for i in range(4):
            if i == 0:
                specs.append((widths[0] // 4, True))
                specs.append((widths[0] // 4, True))
            else:
                specs.append((widths[i - 1] // 4, False))
                specs.append((widths[i] // 4, True))
        # `in_cf` callers hand the radar map channels-first straight off the
        # on-device splat (ops/radar_splat.py emits [B,C,H,W] natively) —
        # when the encoder itself runs CF that kills the [B,320,320,3] entry
        # relayout, the single largest non-compute op in the bs=1 trace
        # (TRACE_SUMMARY_BS1.txt fusion.2223 + copy.1782/1785, ~5%).
        if cf and not in_cf:
            x = jnp.transpose(x, (0, 3, 1, 2))
        elif in_cf and not cf:
            x = jnp.transpose(x, (0, 2, 3, 1))
        outs = []
        for i, (feat, down) in enumerate(specs):
            x = RCBlock(feat, down=down, band=self.band, cf=cf,
                        dtype=self.dtype, name=f"rc_block_{i}")(x, train)
            if i > 1 and i % 2 == 1:    # taps after blocks 3, 5, 7 (line 103)
                outs.append(jnp.transpose(x, (0, 2, 3, 1)) if cf else x)
        return tuple(outs)
