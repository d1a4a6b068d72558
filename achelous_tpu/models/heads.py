"""YOLOX-style decoupled detection head.

reference head/decouplehead.py:16-104.  Per scale: 1x1 stem to base channels
(64 nano / 256 normal), two 5x5 depthwise-separable conv towers for cls and
reg, then 1x1 predictors; output is channel-concat [reg(4), obj(1), cls(K)].
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from achelous_tpu.ops.primitives import ConvBN

Dtype = Any


class DecoupleHead(nn.Module):
    num_classes: int
    nano_head: bool = True     # base 64 vs 256 (decouplehead.py:30-33)
    act: str = "relu"
    depthwise: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        base = 64 if self.nano_head else 256
        outs = []
        for k, x in enumerate(feats):
            x = ConvBN(base, 1, act=self.act, dtype=self.dtype,
                       name=f"stem_{k}")(x, train)
            cls_feat = x
            for j in range(2):
                cls_feat = ConvBN(base, 5, act=self.act, ds_conv=self.depthwise,
                                  dtype=self.dtype,
                                  name=f"cls_conv_{k}_{j}")(cls_feat, train)
            cls_out = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                              dtype=self.dtype, name=f"cls_pred_{k}")(cls_feat)
            reg_feat = x
            for j in range(2):
                reg_feat = ConvBN(base, 5, act=self.act, ds_conv=self.depthwise,
                                  dtype=self.dtype,
                                  name=f"reg_conv_{k}_{j}")(reg_feat, train)
            reg_out = nn.Conv(4, (1, 1), use_bias=True, dtype=self.dtype,
                              name=f"reg_pred_{k}")(reg_feat)
            obj_out = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                              name=f"obj_pred_{k}")(reg_feat)
            # channel order [reg, obj, cls] (decouplehead.py:102)
            outs.append(jnp.concatenate([reg_out, obj_out, cls_out], axis=-1))
        return tuple(outs)
