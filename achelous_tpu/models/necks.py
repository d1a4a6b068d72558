"""Unified Dual-FPN neck with two symmetric segmentation decoders.

The reference ships three 90%-identical files (neck/ghostdualfpn.py,
neck/cspdualfpn.py, neck/repdualfpn.py) that differ only in the fuse/decoder
block family; here it is one parametrized topology (`family` in
{'gdf','cdf','rdf'}).  Unlike the reference — where the neck constructs the
vision backbone internally (ghostdualfpn.py:54-98) — this neck is a peer
module taking the backbone's 4 feature maps as inputs.

Topology (reference ghostdualfpn.py:156-200):
  s32 -> SPP -> fpn5
  fpn5 -up-> cat(s16) -> fuse -> fpn4
  fpn4 -up-> cat(s8)  -> fuse -> fpn3
  fpn3 -> ShuffleAttention x2 -> two decoders, each 3x (1x1+bilinear-2x +
  block) -> seg logits at input resolution (semantic: num_seg ch, lane: 2 ch)
  det feats = (fpn5+s32, fpn4+s16, fpn3+s8)
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from achelous_tpu.core.config import WIDTHS
from achelous_tpu.ops.blocks import Bottleneck, CSPLayer, RepVGGBlock
from achelous_tpu.ops.primitives import (GhostBottleneck, GhostModule,
                                         ShuffleAttention, SPP, SPPF, Upsample)

Dtype = Any


class DualFPN(nn.Module):
    num_seg: int
    phi: str = "S0"
    family: str = "gdf"
    use_spp: bool = True
    deploy: bool = False          # rdf only: fused RepVGG form
    dtype: Dtype = jnp.float32

    def _fuse(self, out_ch: int, name: str):
        """Top-down fuse block after upsample+concat (2*out_ch -> out_ch)."""
        if self.family == "gdf":
            # reference ghostdualfpn.py:107-113
            return GhostBottleneck(mid_chs=out_ch * 2, out_chs=out_ch,
                                   dtype=self.dtype, name=name)
        if self.family == "cdf":
            # reference cspdualfpn.py:146-150
            return CSPLayer(out_ch, dtype=self.dtype, name=name)
        # reference repdualfpn.py:77-84
        return RepVGGBlock(out_ch, deploy=self.deploy, dtype=self.dtype,
                           name=name)

    def _dec(self, out_ch: int, name: str):
        """Segmentation-decoder block."""
        if self.family == "gdf":
            return GhostModule(out_ch, dtype=self.dtype, name=name)
        if self.family == "cdf":
            return Bottleneck(out_ch, dtype=self.dtype, name=name)
        return RepVGGBlock(out_ch, deploy=self.deploy, dtype=self.dtype,
                           name=name)

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...], train: bool = False):
        w = WIDTHS[self.phi]
        _, s8, s16, s32 = feats   # strides 4/8/16/32; stride-4 map unused

        spp_cls = SPP if self.use_spp else SPPF
        fpn5 = spp_cls(w[3], dtype=self.dtype, name="spp")(s32, train)

        x = Upsample(w[2], dtype=self.dtype, name="upsample_5_to_4")(fpn5, train)
        x = jnp.concatenate([x, s16], axis=-1)
        fpn4 = self._fuse(w[2], "fuse_5_to_4")(x, train)

        x = Upsample(w[1], dtype=self.dtype, name="upsample_4_to_3")(fpn4, train)
        x = jnp.concatenate([x, s8], axis=-1)
        fpn3 = self._fuse(w[1], "fuse_4_to_3")(x, train)

        lane = ShuffleAttention(G=4, dtype=self.dtype,
                                name="stage_3_lane_seg")(fpn3)
        sem = ShuffleAttention(G=4, dtype=self.dtype,
                               name="stage_3_semantic_seg")(fpn3)

        def decoder(x, prefix: str, out_classes: int):
            # 3 x (Upsample + block), channel plan w1 -> w1 -> w0 -> w0
            # (reference ghostdualfpn.py:120-152)
            x = Upsample(w[1], dtype=self.dtype, name=f"{prefix}_3_to_2")(x, train)
            x = self._dec(w[1], f"{prefix}_block_3_to_2")(x, train)
            x = Upsample(w[0], dtype=self.dtype, name=f"{prefix}_2_to_1")(x, train)
            x = self._dec(w[0], f"{prefix}_block_2_to_1")(x, train)
            x = Upsample(w[0], dtype=self.dtype, name=f"{prefix}_1_to_0")(x, train)
            x = self._dec(w[0], f"{prefix}_block_1_to_0")(x, train)
            return self._dec(out_classes, f"{prefix}_head")(x, train)

        lane_out = decoder(lane, "lane_seg", 2)
        sem_out = decoder(sem, "se_seg", self.num_seg)

        det = (fpn5 + s32, fpn4 + s16, fpn3 + s8)
        return sem_out, lane_out, det
