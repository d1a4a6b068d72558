"""Augmentation guards (data/augment.py): the flip must transform every
modality together, and the HSV jitter must be label-free and bounded.

The reference's augmentations are dead code (utils/dataloader.py:233,
train.py:543-544); these are the live, modality-consistent replacements —
see ARCHITECTURE.md deviation 7.
"""
import numpy as np

from achelous_tpu.data.augment import (AugmentConfig, SRC_W, U_COLUMN,
                                       augment_sample, hflip_sample,
                                       hsv_jitter)

R = 64


def _sample(rng):
    pts = np.zeros((16, 5), np.float32)
    pts[:8] = rng.uniform(1, 100, (8, 5))
    valid = np.zeros(16, bool)
    valid[:8] = True
    return {
        "image": rng.rand(R, R, 3).astype(np.float32),
        "seg": rng.randint(0, 9, (R, R)).astype(np.int32),
        "wl": rng.randint(0, 2, (R, R)).astype(np.int32),
        "boxes": np.array([[20.0, 30.0, 10.0, 8.0, 2.0]], np.float32),
        "radar_map": rng.rand(R, R, 3).astype(np.float32),
        "radar_points": pts,
        "radar_points_valid": valid,
        "pc": rng.randn(16, 5).astype(np.float32),
        "pc_labels": rng.randint(0, 8, 16).astype(np.int32),
        "name": "s",
    }


def test_hflip_is_an_involution():
    s = _sample(np.random.RandomState(0))
    twice = hflip_sample(hflip_sample(s, R), R)
    for k in ("image", "seg", "wl", "boxes", "radar_map", "radar_points",
              "pc"):
        # rtol: SRC_W - u applied twice rounds in fp32
        np.testing.assert_allclose(twice[k], s[k], rtol=1e-5, err_msg=k)


def test_flipped_points_splat_equals_flipped_map():
    """The two radar pathways must agree under augmentation: splatting the
    FLIPPED raw points must equal flipping the splat of the original points
    (the pre-rasterized radar_map path flips with `[:, ::-1]`).  This pins
    the continuous-coordinate mirror u -> SRC_W - u — mirroring about
    SRC_W - 1 shifts any point with frac(u/6) > 5/6 one grid cell off."""
    import jax.numpy as jnp
    from achelous_tpu.ops.radar_splat import splat_radar_fast

    rng = np.random.RandomState(3)
    res = 320
    pts = np.zeros((64, 5), np.float32)
    pts[:48, :3] = rng.uniform(1, 50, (48, 3))
    # non-integer u/v incl. values near (but not exactly on) cell boundaries
    pts[:48, 3] = rng.uniform(0.5, 1919.4, 48)
    pts[:48, 4] = rng.uniform(0.5, 1079.4, 48)
    pts[40:48, 3] = np.arange(8) * 6.0 + 5.9   # frac(u/6) ~ 0.98 band
    valid = np.arange(64) < 48
    s = {"radar_points": pts, "radar_points_valid": valid,
         "image": np.zeros((res, res, 3), np.float32),
         "seg": np.zeros((res, res), np.int32),
         "wl": np.zeros((res, res), np.int32),
         "boxes": np.zeros((0, 5), np.float32)}
    f = hflip_sample(s, res)
    splat_flipped = np.asarray(splat_radar_fast(
        jnp.asarray(f["radar_points"]), jnp.asarray(valid), resolution=res))
    flipped_splat = np.asarray(splat_radar_fast(
        jnp.asarray(pts), jnp.asarray(valid), resolution=res))[:, ::-1]
    np.testing.assert_array_equal(splat_flipped, flipped_splat)


def test_hflip_transforms_every_modality_together():
    s = _sample(np.random.RandomState(1))
    f = hflip_sample(s, R)
    # image/seg/wl/radar_map mirror the width axis
    np.testing.assert_array_equal(f["image"], s["image"][:, ::-1])
    np.testing.assert_array_equal(f["seg"], s["seg"][:, ::-1])
    np.testing.assert_array_equal(f["radar_map"], s["radar_map"][:, ::-1])
    # boxes mirror cx, keep wh + class
    assert f["boxes"][0, 0] == R - s["boxes"][0, 0]
    np.testing.assert_array_equal(f["boxes"][0, 1:], s["boxes"][0, 1:])
    # valid radar points mirror u about the frame center; padding untouched
    np.testing.assert_allclose(f["radar_points"][:8, U_COLUMN],
                               SRC_W - s["radar_points"][:8, U_COLUMN])
    np.testing.assert_array_equal(f["radar_points"][8:],
                                  s["radar_points"][8:])
    # pc lateral coordinate negates; labels untouched
    np.testing.assert_allclose(f["pc"][:, 1], -s["pc"][:, 1])
    np.testing.assert_array_equal(f["pc_labels"], s["pc_labels"])


def test_box_tracks_pixel_content_through_flip():
    """Paint a bright patch at the box location; after the flip the box
    must still cover it."""
    s = _sample(np.random.RandomState(2))
    cx, cy, w, h = s["boxes"][0, :4]
    s["image"][:] = 0
    s["image"][int(cy - h / 2):int(cy + h / 2),
               int(cx - w / 2):int(cx + w / 2)] = 1.0
    f = hflip_sample(s, R)
    fcx, fcy, fw, fh = f["boxes"][0, :4]
    patch = f["image"][int(fcy - fh / 2):int(fcy + fh / 2),
                       int(fcx - fw / 2) + 1:int(fcx + fw / 2) - 1]
    assert patch.min() == 1.0


def test_hsv_zero_gains_is_identity():
    img = np.random.RandomState(3).randint(0, 255, (32, 32, 3), np.uint8)
    out = hsv_jitter(img, np.random.RandomState(0), 0.0, 0.0, 0.0)
    np.testing.assert_array_equal(out, img)


def test_hsv_jitter_bounded_and_deterministic():
    img = np.random.RandomState(4).randint(0, 255, (32, 32, 3), np.uint8)
    a = hsv_jitter(img, np.random.RandomState(7), 0.1, 0.7, 0.4)
    b = hsv_jitter(img, np.random.RandomState(7), 0.1, 0.7, 0.4)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == img.shape
    assert not np.array_equal(a, img)           # something changed


def test_augment_sample_respects_probability():
    s = _sample(np.random.RandomState(5))
    out = augment_sample(s, R, AugmentConfig(hflip_prob=0.0),
                         np.random.RandomState(0))
    np.testing.assert_array_equal(out["image"], s["image"])
    out = augment_sample(s, R, AugmentConfig(hflip_prob=1.0),
                         np.random.RandomState(0))
    np.testing.assert_array_equal(out["image"], s["image"][:, ::-1])
    assert augment_sample(s, R, None, np.random.RandomState(0)) is s


def test_dataset_augment_wiring(tmp_path):
    """WaterScenesDataset(augment=...) produces valid augmented samples."""
    from PIL import Image
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.data.waterscenes import (WaterScenesDataset,
                                               WaterScenesPaths)

    img_dir = tmp_path / "images"; img_dir.mkdir()
    sem_dir = tmp_path / "sem"; sem_dir.mkdir()
    wl_dir = tmp_path / "wl"; wl_dir.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
        img_dir / "a.jpg")
    Image.fromarray(np.ones((96, 128), np.uint8)).save(sem_dir / "a.png")
    ann = tmp_path / "train.txt"
    ann.write_text(f"{img_dir / 'a.jpg'} 30,20,90,70,1")
    cfg = AchelousConfig(resolution=64, pc_points=16)
    paths = WaterScenesPaths(annotation_file=str(ann),
                             semantic_dir=str(sem_dir),
                             waterline_dir=str(wl_dir))
    ds = WaterScenesDataset(cfg, paths,
                            augment=AugmentConfig(hflip_prob=1.0))
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert len(s["boxes"]) == 1
    base = WaterScenesDataset(cfg, paths)[0]
    # flip with prob 1: the box cx must mirror the unaugmented one
    np.testing.assert_allclose(s["boxes"][0, 0], 64 - base["boxes"][0, 0])
