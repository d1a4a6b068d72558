"""RepViT backbone (`rv`) — MobileNet-style blocks with reparameterizable
RepVGGDW depthwise mixers.

reference backbone/vision/repvit_modules/repvit.py:31-371.  Features are the
block outputs at the per-variant `out_slices` indices (slice 0 = patch
embedding counts as features[0]).  SqueezeExcite follows timm 0.6.7
(rd_channels = round(c * 0.25), conv-with-bias reduce/expand).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp

Dtype = Any


def _conv_bn(x, feats, k, stride, groups, mod, train, name,
             bn_init_zero=False):
    p = (k - 1) // 2
    x = nn.Conv(feats, (k, k), strides=stride, padding=[(p, p), (p, p)],
                feature_group_count=groups, use_bias=False, dtype=mod.dtype,
                name=f"{name}_c")(x)
    scale_init = nn.initializers.zeros if bn_init_zero else nn.initializers.ones
    return F32BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, scale_init=scale_init, dtype=mod.dtype,
                        name=f"{name}_bn")(x)


class TimmSqueezeExcite(nn.Module):
    """timm 0.6.7 efficientnet SqueezeExcite: rd = round(c * rd_ratio)."""
    rd_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rd = round(c * self.rd_ratio)
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(rd, dtype=self.dtype, name="conv_reduce")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)[:, None, None, :]


class RepVGGDW(nn.Module):
    """repvit.py:90-120: dw3x3+BN + dw1x1+BN + identity (deploy: one conv)."""
    dim: int
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            return nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                           feature_group_count=self.dim, use_bias=True,
                           dtype=self.dtype, name="reparam_conv")(x)
        a = _conv_bn(x, self.dim, 3, 1, self.dim, self, train, "conv")
        b = _conv_bn(x, self.dim, 1, 1, self.dim, self, train, "conv1")
        return a + b + x


class RepViTBlock(nn.Module):
    """repvit.py:123-159."""
    oup: int
    kernel_size: int = 3
    stride: int = 1
    use_se: bool = False
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        if self.stride == 2:
            y = _conv_bn(x, inp, self.kernel_size, 2, inp, self, train, "tm_dw")
            if self.use_se:
                y = TimmSqueezeExcite(dtype=self.dtype, name="se")(y)
            y = _conv_bn(y, self.oup, 1, 1, 1, self, train, "tm_pw")
            res = y
            z = _conv_bn(y, 2 * self.oup, 1, 1, 1, self, train, "cm_fc1")
            z = jax.nn.gelu(z, approximate=False)
            z = _conv_bn(z, self.oup, 1, 1, 1, self, train, "cm_fc2",
                         bn_init_zero=True)
            return res + z
        # stride 1 (identity guaranteed): RepVGGDW mixer + SE + FFN residual
        y = RepVGGDW(inp, deploy=self.deploy, dtype=self.dtype,
                     name="tm_repdw")(x, train)
        if self.use_se:
            y = TimmSqueezeExcite(dtype=self.dtype, name="se")(y)
        res = y
        z = _conv_bn(y, 2 * inp, 1, 1, 1, self, train, "cm_fc1")
        z = jax.nn.gelu(z, approximate=False)
        z = _conv_bn(z, self.oup, 1, 1, 1, self, train, "cm_fc2",
                     bn_init_zero=True)
        return res + z


# (k, c, use_se, stride) per block — t==2 and use_hs are constant in all cfgs
# (repvit.py:262-371)
CFGS = {
    "S0": ([(32, 1, 1), (32, 0, 1), (32, 0, 1), (48, 0, 2), (48, 1, 1),
            (48, 0, 1), (48, 0, 1), (96, 0, 2)] +
           [(96, se, 1) for se in (1, 0) * 7] + [(96, 0, 1)] +
           [(176, 0, 2), (176, 1, 1), (176, 0, 1)],
           (2, 6, 22, 25)),
    "S1": ([(32, 1, 1), (32, 0, 1), (32, 0, 1), (48, 0, 2), (48, 1, 1),
            (48, 0, 1), (48, 0, 1), (120, 0, 2)] +
           [(120, se, 1) for se in (1, 0) * 6] + [(120, 0, 1)] +
           [(224, 0, 2), (224, 1, 1), (224, 0, 1)],
           (2, 6, 20, 24)),
    "S2": ([(32, 1, 1), (32, 0, 1), (32, 1, 1), (32, 0, 1), (32, 0, 1),
            (64, 0, 2), (64, 1, 1), (64, 0, 1), (64, 1, 1), (64, 0, 1),
            (64, 0, 1), (144, 0, 2)] +
           [(144, se, 1) for se in (1, 0) * 9] + [(144, 0, 1)] +
           [(288, 0, 2), (288, 1, 1), (288, 0, 1)],
           (4, 10, 30, 34)),
}


class RepViT(nn.Module):
    """repvit.py:222-251."""
    phi: str = "S0"
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        cfg, out_slices = CFGS[self.phi]
        c0 = cfg[0][0]
        # patch embed: conv-BN s2 + GELU + conv-BN s2 (repvit.py:231-232)
        x = _conv_bn(x, c0 // 2, 3, 2, 1, self, train, "stem0")
        x = jax.nn.gelu(x, approximate=False)
        x = _conv_bn(x, c0, 3, 2, 1, self, train, "stem1")
        outputs = [x]                           # slices_list[0] = patch embed
        for i, (c, use_se, s) in enumerate(cfg):
            x = RepViTBlock(c, 3, s, bool(use_se), deploy=self.deploy,
                            dtype=self.dtype, name=f"block_{i}")(x, train)
            outputs.append(x)
        return tuple(outputs[i] for i in out_slices)


def repvit_m1(**kw):
    return RepViT(phi="S0", **kw)


def repvit_m2(**kw):
    return RepViT(phi="S1", **kw)


def repvit_m3(**kw):
    return RepViT(phi="S2", **kw)


REPVIT_VARIANTS = {"S0": repvit_m1, "S1": repvit_m2, "S2": repvit_m3}
