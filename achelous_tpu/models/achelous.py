"""Top-level Achelous assembly: 5-task vision-radar perception model.

reference nets/Achelous.py:26-76 and backbone/IREncoder.py:27-91.  One jitted
forward produces:
  det:   3 scale maps [B, Hs, Ws, 4+1+num_det]   (strides 8/16/32)
  sem:   [B, R, R, num_seg]  semantic seg logits (drivable area = class 8)
  lane:  [B, R, R, 2]        waterline seg logits
  pc:    [B, N, pc_classes]  point-cloud seg log-probs

Unlike the reference (neck owns backbone, IREncoder owns neck), backbone /
neck / radar-encoder / fusion are peer modules under one config.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from achelous_tpu.ops.norm import F32BatchNorm
import jax.numpy as jnp

from achelous_tpu.core.config import AchelousConfig, WIDTHS
from achelous_tpu.models.edgenext import EDGENEXT_VARIANTS
from achelous_tpu.models.heads import DecoupleHead
from achelous_tpu.models.necks import DualFPN
from achelous_tpu.models.pointnet import PointNetSeg
from achelous_tpu.models.rcnet import RCNet
from achelous_tpu.ops.primitives import ECA

Dtype = Any


def make_backbone(cfg: AchelousConfig, name: str = "backbone",
                  deploy: bool = False):
    """Vision-backbone registry keyed by the reference's --backbone axis."""
    kw = dict(dtype=cfg.dtype, name=name)
    if cfg.backbone in ("rv", "mo", "fv"):   # reparameterizable families
        kw["deploy"] = deploy
    if cfg.backbone == "en":
        return EDGENEXT_VARIANTS[cfg.phi](**kw)
    if cfg.backbone == "mv":
        from achelous_tpu.models.mobilevit import MOBILEVIT_VARIANTS
        return MOBILEVIT_VARIANTS[cfg.phi](**kw)
    if cfg.backbone == "ef":
        from achelous_tpu.models.efficientformer import EFORMER_VARIANTS
        return EFORMER_VARIANTS[cfg.phi](resolution=cfg.resolution, **kw)
    if cfg.backbone == "ev":
        from achelous_tpu.models.edgevit import EDGEVIT_VARIANTS
        return EDGEVIT_VARIANTS[cfg.phi](**kw)
    if cfg.backbone == "rv":
        from achelous_tpu.models.repvit import REPVIT_VARIANTS
        return REPVIT_VARIANTS[cfg.phi](**kw)
    if cfg.backbone == "pf":
        from achelous_tpu.models.poolformer import POOLFORMER_VARIANTS
        return POOLFORMER_VARIANTS[cfg.phi](**kw)
    if cfg.backbone == "mo":
        from achelous_tpu.models.mobileone import MOBILEONE_VARIANTS
        return MOBILEONE_VARIANTS[cfg.phi](**kw)
    if cfg.backbone == "fv":
        from achelous_tpu.models.fastvit import FASTVIT_VARIANTS
        return FASTVIT_VARIANTS[cfg.phi](**kw)
    raise ValueError(f"unknown backbone {cfg.backbone!r}")


class IRFusion(nn.Module):
    """Per-scale image-radar fusion (reference backbone/IREncoder.py:46-91):
    ECA on each modality, channel concat (C + C/4), BN + ReLU."""
    phi: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_feats, radar_feats, train: bool = False):
        fused = []
        for i, (fi, fr) in enumerate(zip(img_feats, radar_feats)):
            a = ECA(dtype=self.dtype, name=f"eca_img_{i}")(fi)
            b = ECA(dtype=self.dtype, name=f"eca_radar_{i}")(fr)
            x = jnp.concatenate([a, b], axis=-1)
            x = F32BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"norm_{i}")(x)
            fused.append(nn.relu(x))
        return tuple(fused)


class Achelous(nn.Module):
    """5-task model (reference nets/Achelous.py:26-53).  Set
    `with_pc=False` for the 3-task Achelous3T variant (nets/Achelous.py:56-76).
    """
    cfg: AchelousConfig
    with_pc: bool = True
    deploy: bool = False

    @nn.compact
    def __call__(self, image, radar_map, point_cloud=None, train: bool = False):
        cfg = self.cfg
        backbone = make_backbone(cfg, deploy=self.deploy)
        feats = backbone(image, train=train)

        sem, lane, det_img = DualFPN(num_seg=cfg.num_seg, phi=cfg.phi,
                                     family=cfg.neck, use_spp=cfg.use_spp,
                                     deploy=self.deploy, dtype=cfg.dtype,
                                     name="fpn")(feats, train)

        # The radar map is accepted in either layout: NHWC [B,R,R,3] (the
        # repo convention) or channels-first [B,3,R,R] — the reference's own
        # tensor layout (utils/dataloader.py:157-158 feeds NCHW) and what the
        # on-device splat emits.  CF input + CF-chained RCNet skips the
        # [B,320,320,3] entry relayout entirely (TRACE_SUMMARY_BS1.txt).
        # Shape-based detection is unambiguous: resolution >= 32 > channels.
        radar_cf = (radar_map.shape[1] == cfg.radar_channels
                    and radar_map.shape[-1] != cfg.radar_channels)
        radar_feats = RCNet(phi=cfg.phi, band=cfg.deform_band,
                            dtype=cfg.dtype,
                            name="radar_encoder")(radar_map, train,
                                                  in_cf=radar_cf)

        # det_img is (P5, P4, P3) high-to-low stride; fuse per scale with the
        # matching radar feature then feed the head P3->P5
        # (IREncoder.py:79-89 fuses stage3/4/5 in low-to-high order).
        p5, p4, p3 = det_img
        fused = IRFusion(phi=cfg.phi, dtype=cfg.dtype, name="ir_fusion")(
            (p3, p4, p5), radar_feats, train)
        det = DecoupleHead(num_classes=cfg.num_det, nano_head=cfg.nano_head,
                           dtype=cfg.dtype, name="det_head")(fused, train)

        if not self.with_pc:
            return det, sem, lane
        if cfg.pc_model == "pn2":
            from achelous_tpu.models.pointnet2 import PointNet2Seg
            pc_out, trans_feat = PointNet2Seg(num_classes=cfg.pc_classes,
                                              dtype=cfg.dtype,
                                              name="pc_seg")(point_cloud, train)
        else:
            pc_out, trans_feat = PointNetSeg(num_classes=cfg.pc_classes,
                                             dtype=cfg.dtype,
                                             name="pc_seg")(point_cloud, train)
        if trans_feat is not None:
            self.sow("intermediates", "pc_trans_feat", trans_feat)
        return det, sem, lane, pc_out


def create_model(cfg: AchelousConfig, with_pc: bool = True,
                 deploy: bool = False) -> Achelous:
    return Achelous(cfg=cfg, with_pc=with_pc, deploy=deploy)


def example_inputs(cfg: AchelousConfig, batch: int = 1):
    """Zero-filled example inputs in NHWC / [B,N,C] layout."""
    r = cfg.resolution
    img = jnp.zeros((batch, r, r, cfg.image_channels), cfg.dtype)
    rad = jnp.zeros((batch, r, r, cfg.radar_channels), cfg.dtype)
    pc = jnp.zeros((batch, cfg.pc_points, cfg.pc_channels), cfg.dtype)
    return img, rad, pc
