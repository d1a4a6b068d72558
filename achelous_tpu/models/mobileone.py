"""MobileOne backbone (`mo`, RDF-neck only) — pure-conv reparam backbone.

reference backbone/vision/mobileone_modules/mobileone.py:55-440.  5 stages
(stem + 4), each stage = [depthwise k3, pointwise 1x1] pairs; k
over-parameterized conv branches at train time fold into one conv at deploy.
Widths come straight from the shared table (PARAMS, mobileone.py:388-392).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from achelous_tpu.core.config import WIDTHS
from achelous_tpu.ops.mobileone_block import MobileOneBlock

Dtype = Any

NUM_BLOCKS = (2, 8, 10, 1)          # mobileone.py:306 num_blocks_per_stage
NUM_BRANCHES = {"S0": 4, "S1": 1, "S2": 1}   # mobileone.py:388-392


class MobileOne(nn.Module):
    phi: str = "S0"
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        widths = WIDTHS[self.phi]
        branches = NUM_BRANCHES[self.phi]
        in_planes = min(64, widths[0])
        x = MobileOneBlock(in_planes, 3, stride=2, deploy=self.deploy,
                           dtype=self.dtype, name="stage0")(x, train)
        feats = []
        for si, (planes, nb) in enumerate(zip(widths, NUM_BLOCKS)):
            for bi in range(nb):
                stride = 2 if bi == 0 else 1
                cin = x.shape[-1]
                x = MobileOneBlock(cin, 3, stride=stride, groups=cin,
                                   num_conv_branches=branches,
                                   deploy=self.deploy, dtype=self.dtype,
                                   name=f"stage{si + 1}_dw{bi}")(x, train)
                x = MobileOneBlock(planes, 1, stride=1,
                                   num_conv_branches=branches,
                                   deploy=self.deploy, dtype=self.dtype,
                                   name=f"stage{si + 1}_pw{bi}")(x, train)
            feats.append(x)
        return tuple(feats)


def mobileone_s0(**kw):
    return MobileOne(phi="S0", **kw)


def mobileone_s1(**kw):
    return MobileOne(phi="S1", **kw)


def mobileone_s2(**kw):
    return MobileOne(phi="S2", **kw)


MOBILEONE_VARIANTS = {"S0": mobileone_s0, "S1": mobileone_s1,
                      "S2": mobileone_s2}
