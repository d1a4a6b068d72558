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


# ---------------------------------------------------------------------------
# mosaic (radar-consistent rebuild of the reference's dead 4-image mosaic,
# utils/dataloader.py:236-487)

class _CenterRng:
    """RandomState stand-in that pins the mosaic center to the midpoint."""

    def __init__(self, seed=0):
        self._r = np.random.RandomState(seed)

    def uniform(self, lo, hi, size=None):
        if size is None:
            return (lo + hi) / 2.0
        return self._r.uniform(lo, hi, size)

    def __getattr__(self, k):
        return getattr(self._r, k)


def _mosaic_inputs(seed=0, n_pts=4):
    rng = np.random.RandomState(seed)
    samples = []
    for i in range(4):
        s = _sample(np.random.RandomState(seed + i))
        s["seg"][:] = i + 1
        s["wl"][:] = i % 2
        s["radar_map"][:] = float(i + 1)
        s["boxes"] = np.array([[20.0 + i, 30.0, 10.0, 8.0, float(i)]],
                              np.float32)
        pts = np.zeros((16, 5), np.float32)
        pts[:n_pts, :3] = i + 1
        # u/v spread far apart so transformed points never collide
        pts[:n_pts, U_COLUMN] = rng.uniform(100, 1800, n_pts)
        pts[:n_pts, 4] = rng.uniform(100, 1000, n_pts)
        s["radar_points"] = pts
        s["radar_points_valid"] = np.arange(16) < n_pts
        samples.append(s)
    return samples


def test_mosaic_box_geometry_and_masks():
    from achelous_tpu.data.augment import mosaic_samples
    samples = _mosaic_inputs()
    out = mosaic_samples(samples, R, _CenterRng())
    c = R // 2
    # center pinned at (0.5, 0.5): each box scales by exactly 1/2 into its
    # quadrant, classes preserved
    quads = ((0, 0), (c, 0), (0, c), (c, c))
    assert len(out["boxes"]) == 4
    for i, (x0, y0) in enumerate(quads):
        bx = samples[i]["boxes"][0]
        expect = [bx[0] / 2 + x0, bx[1] / 2 + y0, bx[2] / 2, bx[3] / 2, bx[4]]
        got = out["boxes"][out["boxes"][:, 4] == i][0]
        np.testing.assert_allclose(got, expect, rtol=1e-6)
    # masks + raster radar map: each quadrant holds its sample's constant
    for i, (x0, y0) in enumerate(quads):
        assert (out["seg"][y0:y0 + c, x0:x0 + c] == i + 1).all()
        assert (out["wl"][y0:y0 + c, x0:x0 + c] == i % 2).all()
        assert (out["radar_map"][y0:y0 + c, x0:x0 + c] == i + 1).all()
    # pc branch: primary sample's cloud untouched
    np.testing.assert_array_equal(out["pc"], samples[0]["pc"])
    np.testing.assert_array_equal(out["pc_labels"], samples[0]["pc_labels"])


def test_mosaic_points_land_in_their_quadrant_cells():
    """The per-quadrant (u, v) affine must put every re-splatted point at
    exactly the grid cell its quadrant geometry predicts — the invariant
    that makes the on-device mosaic radar map exact (the reference's
    offline-raster mosaic could only approximate this)."""
    import jax.numpy as jnp
    from achelous_tpu.data.augment import SRC_H, mosaic_samples
    from achelous_tpu.ops.radar_splat import splat_radar_fast

    res = 320
    samples = _mosaic_inputs(seed=3)
    for s in samples:  # run at the real splat resolution
        for k in ("image",):
            s[k] = np.zeros((res, res, 3), np.float32)
        s["seg"] = np.zeros((res, res), np.int32)
        s["wl"] = np.zeros((res, res), np.int32)
        s["radar_map"] = None
    rng = _CenterRng(1)
    out = mosaic_samples(samples, res, rng)
    c = res // 2
    quads = ((0, 0), (c, 0), (0, c), (c, c))

    grid = np.asarray(splat_radar_fast(
        jnp.asarray(out["radar_points"]),
        jnp.asarray(out["radar_points_valid"]), resolution=res))
    n_valid = int(out["radar_points_valid"].sum())
    assert n_valid == 16     # 4 samples x 4 points, under the 16-point cap
    seen = 0
    for i, (x0, y0) in enumerate(quads):
        for u, v in zip(*[samples[i]["radar_points"][:4, col]
                          for col in (U_COLUMN, 4)]):
            colx = int(np.floor((u * 0.5 + x0 * SRC_W / res)
                                / (SRC_W / res)))
            rowy = int(np.floor((v * 0.5 + y0 * SRC_H / res)
                                / (SRC_H / res)))
            assert x0 <= colx < x0 + c and y0 <= rowy < y0 + c
            # splat layout: H indexes v, W indexes u
            np.testing.assert_allclose(grid[rowy, colx], i + 1, rtol=1e-6)
            seen += 1
    assert seen == 16


def test_mosaic_point_cap_subsamples_without_replacement():
    from achelous_tpu.data.augment import mosaic_samples
    samples = _mosaic_inputs(seed=5, n_pts=16)   # 64 points > 16 cap
    out = mosaic_samples(samples, R, _CenterRng(2))
    assert out["radar_points_valid"].sum() == 16
    feats = out["radar_points"][out["radar_points_valid"]][:, :3]
    # no duplicate rows (choice without replacement); features from >1 frame
    assert len(np.unique(out["radar_points"][out["radar_points_valid"]],
                         axis=0)) == 16
    assert len(np.unique(feats[:, 0])) > 1


def test_dataset_mosaic_wiring(tmp_path):
    """mosaic_prob=1 composes 4 loads into one sample end-to-end, and the
    result collates into the static train batch."""
    from PIL import Image
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.data.waterscenes import (WaterScenesDataset,
                                               WaterScenesPaths, collate)

    img_dir = tmp_path / "images"; img_dir.mkdir()
    sem_dir = tmp_path / "sem"; sem_dir.mkdir()
    wl_dir = tmp_path / "wl"; wl_dir.mkdir()
    radar_dir = tmp_path / "radar"; radar_dir.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for name in ("a", "b"):
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
            img_dir / f"{name}.jpg")
        Image.fromarray(np.ones((96, 128), np.uint8)).save(
            sem_dir / f"{name}.png")
        (radar_dir / f"{name}.csv").write_text(
            "range,doppler,rcs,u,v,x,y,z,comp_velocity,label\n"
            "10,1,5,100,50,1,2,3,0.5,2\n"
            "20,2,6,60,30,2,3,4,0.6,3\n")
        lines.append(f"{img_dir / f'{name}.jpg'} 30,20,90,70,1")
    ann = tmp_path / "train.txt"
    ann.write_text("\n".join(lines))
    cfg = AchelousConfig(resolution=64, pc_points=16)
    paths = WaterScenesPaths(annotation_file=str(ann),
                             semantic_dir=str(sem_dir),
                             waterline_dir=str(wl_dir),
                             radar_csv_dir=str(radar_dir))
    ds = WaterScenesDataset(
        cfg, paths, augment=AugmentConfig(hflip_prob=0.0, hue=0, sat=0,
                                          val=0, mosaic_prob=1.0))
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["name"].endswith("_mosaic")
    assert len(s["boxes"]) == 4                  # one box per quadrant
    assert s["radar_points_valid"].sum() == 8    # 2 points x 4 quadrants
    batch = collate([s, ds[1]], cfg, max_gt=10)
    assert batch["gt_mask"].sum() == 8
    assert batch["radar_points"].shape == (2, 16, 5)
