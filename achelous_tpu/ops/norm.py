"""BatchNorm with fp32 statistics regardless of activation dtype.

In bf16 a mean/variance reduction over B*H*W (up to ~10^6) elements loses
nearly all precision (8-bit mantissa accumulation) — measured to stall
detection training entirely while fp32 converges on the same batch.  This
drop-in replacement computes statistics and normalization in fp32 and casts
the result back to the activation dtype — torch.autocast does the same by
keeping BN in fp32 (the reference trains under autocast, train.py:393-398).

Parameter/stat names match flax.linen.BatchNorm ('scale'/'bias',
'mean'/'var') so parameter trees and the reparam folds are unchanged.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class F32BatchNorm(nn.Module):
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None          # accepted for call-site compatibility; the
                               # output always matches the input dtype
    axis: int = -1             # feature axis (1 for the CF-chained RCNet;
                               # param/stat shapes stay (C,) either way)
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        ax = self.axis % x.ndim
        feats = x.shape[ax]
        bshape = [1] * x.ndim
        bshape[ax] = feats

        def bc(v):
            return v.reshape(bshape)

        scale = self.param("scale", self.scale_init, (feats,), jnp.float32)
        bias = self.param("bias", self.bias_init, (feats,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (feats,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (feats,), jnp.float32)
        if self.use_running_average:
            # eval: fold into a per-channel affine computed in fp32 and
            # applied in the activation dtype — no fp32 casts of the
            # activations, so inference cost matches a plain bf16 BN
            t = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return x * bc(t.astype(x.dtype)) + \
                bc((bias - ra_mean.value * t).astype(x.dtype))
        xf = x.astype(jnp.float32)
        axes = tuple(i for i in range(x.ndim) if i != ax)
        mean = jnp.mean(xf, axes)
        var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value +
                             (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value +
                            (1.0 - self.momentum) * var)
        y = (xf - bc(mean)) * jax.lax.rsqrt(bc(var) + self.epsilon) \
            * bc(scale) + bc(bias)
        return y.astype(x.dtype)
