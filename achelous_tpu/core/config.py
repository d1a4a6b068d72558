"""Single source of truth for model configuration.

The reference duplicates its channel-width table in 8 files (see
reference backbone/vision/ImageEncoder.py:16-21, neck/ghostdualfpn.py:20-25,
head/decouplehead.py:8-13, nets/Achelous.py:18-23, ...).  Here there is exactly
one table and one frozen config dataclass that every module reads from.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp

# reference neck/ghostdualfpn.py:20-25 — shared 4-stage channel widths
# (strides 4 / 8 / 16 / 32).
WIDTHS: dict[str, Tuple[int, int, int, int]] = {
    "L": (40, 80, 192, 384),
    "S2": (32, 64, 144, 288),
    "S1": (32, 48, 120, 224),
    "S0": (32, 48, 96, 176),
}

BACKBONES = ("en", "mv", "ef", "ev", "rv", "pf", "mo", "fv")
NECKS = ("gdf", "cdf", "rdf")
PC_MODELS = ("pn", "pn2")


@dataclasses.dataclass(frozen=True)
class AchelousConfig:
    """Configuration of the full 5-task Achelous model.

    Mirrors the reference's `--backbone/--neck/--phi/--pc_model` axes
    (reference train.py:35-57) plus the inference `_defaults`
    (reference achelous.py:23-104).
    """

    # task dimensions
    num_det: int = 7          # detection classes (model_data/waterscenes_benchmark.txt)
    num_seg: int = 9          # semantic-seg classes incl. background (train.py:277)
    pc_classes: int = 8       # radar point-cloud seg classes (achelous.py:95)

    # architecture axes
    phi: str = "S0"
    backbone: str = "en"
    neck: str = "gdf"
    pc_model: str = "pn"
    nano_head: bool = True    # 64-ch head stem vs 256 (decouplehead.py:30-33)
    use_spp: bool = True      # SPP vs SPPF (ghostdualfpn.py:100-103)

    # inputs
    resolution: int = 320
    image_channels: int = 3
    radar_channels: int = 3   # rasterized radar map channels (range/doppler/rcs)
    pc_channels: int = 5      # x, y, z, comp_velocity, rcs (achelous.py:92)
    pc_points: int = 512      # points per frame (achelous.py:94)

    # numerics
    dtype: Any = jnp.float32        # activation/compute dtype (bf16 for speed)
    param_dtype: Any = jnp.float32  # parameter storage dtype

    # deformable-conv implementation (RCNet, ops/deform.py).  An integer
    # selects the banded shift-decomposition with offsets clipped to
    # [-band, band] cells — on TPU it replaces the per-pixel gather (priced
    # per gather ROW, which makes exact unbounded sampling several times
    # slower than banded for RCNet at bs=32) with static shifts + bilinear
    # hat weights.  Exactly equal to torchvision semantics whenever
    # |offset| <= band (true at the reference's zero init and for trained
    # DCN offsets).  None = exact unbounded-offset gather path.
    deform_band: Any = 4

    def __post_init__(self):
        if self.phi not in WIDTHS:
            raise ValueError(f"phi must be one of {tuple(WIDTHS)}, got {self.phi!r}")
        if self.backbone not in BACKBONES:
            raise ValueError(f"backbone must be one of {BACKBONES}, got {self.backbone!r}")
        if self.neck not in NECKS:
            raise ValueError(f"neck must be one of {NECKS}, got {self.neck!r}")
        if self.pc_model not in PC_MODELS:
            raise ValueError(f"pc_model must be one of {PC_MODELS}, got {self.pc_model!r}")
        if self.neck == "rdf" and self.backbone not in ("mo", "fv"):
            raise ValueError("rdf neck only supports 'mo'/'fv' backbones "
                             "(reference neck/repdualfpn.py:53-69)")
        if self.phi == "L" and self.backbone != "ef":
            raise ValueError("only EfficientFormerV2 supports the L size "
                             "(reference neck/ghostdualfpn.py:96-98)")
        if self.resolution % 32 != 0:
            raise ValueError("resolution must be a multiple of 32")
        if self.num_seg > 31:
            raise ValueError("num_seg must be <= 31 (reference ghostdualfpn.py:51-52)")

    @property
    def widths(self) -> Tuple[int, int, int, int]:
        return WIDTHS[self.phi]

    @property
    def det_in_channels(self) -> Tuple[int, int, int]:
        """Channels of the radar-fused P3/P4/P5 det features: width*5/4.

        reference head/decouplehead.py:21 and backbone/IREncoder.py:52,60,68.
        """
        w = self.widths
        return (w[1] * 5 // 4, w[2] * 5 // 4, w[3] * 5 // 4)

    @property
    def name(self) -> str:
        """Reference naming convention, e.g. EN-GDF-PN-S0 (README.md:80-94)."""
        return (f"{self.backbone.upper()}-{self.neck.upper()}-"
                f"{self.pc_model.upper()}-{self.phi}")

    def replace(self, **kw) -> "AchelousConfig":
        return dataclasses.replace(self, **kw)
