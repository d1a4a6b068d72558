"""MobileOne over-parameterized conv block (shared by the `mo` backbone and
FastViT's stem/embeddings/mixers).

reference backbone/vision/mobileone_modules/mobileone.py:55-277 and
backbone/vision/fastvit_modules/modules/mobileone.py (adds use_act /
use_scale_branch / num_conv_branches=0 options).  Train form: k parallel
conv+BN branches + 1x1 scale branch (k>1 kernels) + BN identity; deploy form
(`deploy=True`): single conv with bias, produced by core.reparam.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax
import jax.numpy as jnp

Dtype = Any


class SEBlock(nn.Module):
    """Squeeze-excite (mobileone.py:16-52), rd_ratio 1/16."""
    rd_ratio: float = 0.0625
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(int(c * self.rd_ratio), dtype=self.dtype, name="reduce")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s)[:, None, None, :]


class MobileOneBlock(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_se: bool = False
    use_act: bool = True
    use_scale_branch: bool = True
    num_conv_branches: int = 1
    act: str = "relu"     # backbone mobileone.py:102 uses ReLU; FastViT's
                          # copy defaults to GELU (modules/mobileone.py:81)
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        k = self.kernel_size
        p = k // 2

        def post(y):
            if self.use_se:
                y = SEBlock(dtype=self.dtype, name="se")(y)
            if not self.use_act:
                return y
            return jax.nn.relu(y) if self.act == "relu" else \
                jax.nn.gelu(y, approximate=False)

        if self.deploy:
            y = nn.Conv(self.features, (k, k), strides=self.stride,
                        padding=[(p, p), (p, p)],
                        feature_group_count=self.groups, use_bias=True,
                        dtype=self.dtype, name="reparam_conv")(x)
            return post(y)

        def conv_bn(kk, name):
            pp = kk // 2
            y = nn.Conv(self.features, (kk, kk), strides=self.stride,
                        padding=[(pp, pp), (pp, pp)],
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(x)
            return F32BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name=f"{name}_bn")(y)

        out = 0.0
        if cin == self.features and self.stride == 1:
            out = F32BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype,
                               name="rbr_skip")(x)
        if self.use_scale_branch and k > 1:
            out = out + conv_bn(1, "rbr_scale")
        for i in range(self.num_conv_branches):
            out = out + conv_bn(k, f"rbr_conv_{i}")
        return post(out)
