"""Training-time augmentation: HSV jitter + modality-consistent flip.

The reference DEFINES mosaic/mixup/HSV augmentation (utils/dataloader.py:
236-487) but its effective train path never executes it (`get_random_data`
returns before the augment block, :233, and train.py:543-544 passes
train=False, mosaic=False) — almost certainly because those image-only
transforms would silently desynchronize the radar map, the point cloud and
the segmentation masks.  Here augmentation is implemented so every modality
transforms together:

  * HSV jitter (image only — label-free by construction): uniform gains on
    the H/S/V channels, same convention as the reference's dead code
    (dataloader.py:316-330, gains hue=.1 sat=0.7 val=0.4);
  * horizontal flip: image / radar map / seg / waterline flip their width
    axis, boxes mirror cx, raw radar points mirror the projected image
    column u (the splat grid input, radar_feature_map_generate.ipynb cell 6),
    and the point-cloud branch negates the lateral coordinate so per-point
    labels stay valid.

Geometric mosaic/scale jitter across four samples is deliberately out of
scope (ARCHITECTURE.md deviation 7) — it has no radar-consistent analogue.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

SRC_W = 1920          # WaterScenes camera width the radar u column lives in
U_COLUMN = 3          # index of u in SPLAT_FEATURES = [range,doppler,rcs,u,v]


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    hflip_prob: float = 0.5
    hue: float = 0.1              # reference dataloader.py:243 defaults
    sat: float = 0.7
    val: float = 0.4
    pc_lateral_axis: int = 1      # index of the lateral coord in PC_FEATURES


def hsv_jitter(image_u8: np.ndarray, rng: np.random.RandomState,
               hue: float, sat: float, val: float) -> np.ndarray:
    """Random H/S/V gains on a uint8 RGB array (dataloader.py:316-330
    semantics: r = uniform(-1,1,3)*[h,s,v]+1; hue wraps, sat/val scale with
    clipping).

    Hue-wrap equivalence: the reference's (dead) cv2 code wraps hue as
    (h_cv * r) % 180 on cv2's 0..179 half-degree wheel; here PIL's 0..255
    wheel wraps as (h_pil * r) % 256.  Both equal (deg * r) mod 360 in
    degree space — h_cv = deg/2 and h_pil = deg*256/360 are linear
    reparameterizations, so the modulus rescales with the wheel.  The only
    residual difference is uint8 quantization granularity (180 vs 256
    levels, < 2 degrees), not the distribution."""
    if hue <= 0 and sat <= 0 and val <= 0:
        return image_u8
    from PIL import Image
    r = rng.uniform(-1, 1, 3) * [hue, sat, val] + 1
    hsv = np.asarray(Image.fromarray(image_u8).convert("HSV"),
                     np.float32)
    h = (hsv[..., 0] * r[0]) % 256
    s = np.clip(hsv[..., 1] * r[1], 0, 255)
    v = np.clip(hsv[..., 2] * r[2], 0, 255)
    out = Image.fromarray(np.stack([h, s, v], -1).astype(np.uint8),
                          mode="HSV").convert("RGB")
    return np.asarray(out)


def hflip_sample(sample: dict, resolution: int,
                 pc_lateral_axis: int = 1, src_w: int = SRC_W) -> dict:
    """Mirror EVERY modality of one (post-letterbox) sample.

    Pure function; applying it twice returns the original sample
    (tests/test_augment.py pins the involution).
    """
    out = dict(sample)
    out["image"] = sample["image"][:, ::-1].copy()
    out["seg"] = sample["seg"][:, ::-1].copy()
    out["wl"] = sample["wl"][:, ::-1].copy()
    boxes = sample["boxes"].copy()
    if len(boxes):
        boxes[:, 0] = resolution - boxes[:, 0]     # cx in cxcywh
    out["boxes"] = boxes
    if sample.get("radar_map") is not None:
        out["radar_map"] = sample["radar_map"][:, ::-1].copy()
    pts = sample.get("radar_points")
    if pts is not None:
        pts = pts.copy()
        valid = sample["radar_points_valid"]
        # continuous-coordinate mirror about the frame center (src_w/2), the
        # same convention as the image/radar_map/grid `[:, ::-1]` flips —
        # mirroring about src_w-1 instead would shift boundary points one
        # splat grid cell off the flipped pre-rasterized radar_map (the splat
        # quantizes with floor(u/6); equality pinned in test_augment.py)
        pts[valid, U_COLUMN] = src_w - pts[valid, U_COLUMN]
        out["radar_points"] = pts
    pc = sample.get("pc")
    if pc is not None:
        pc = pc.copy()
        pc[:, pc_lateral_axis] = -pc[:, pc_lateral_axis]
        out["pc"] = pc
    return out


def augment_sample(sample: dict, resolution: int,
                   acfg: Optional[AugmentConfig],
                   rng: np.random.RandomState) -> dict:
    """Flip branch of the per-sample augmentation (HSV happens earlier, on
    the raw uint8 image — see WaterScenesDataset.__getitem__)."""
    if acfg is None:
        return sample
    if rng.rand() < acfg.hflip_prob:
        sample = hflip_sample(sample, resolution, acfg.pc_lateral_axis)
    return sample
