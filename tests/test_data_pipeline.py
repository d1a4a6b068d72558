"""Data pipeline tests on a synthesized 4-sample WaterScenes-format fixture,
plus radar-splat parity vs a numpy oracle of the reference notebook loop
(radar_feature_map_generate.ipynb cells 5-8)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.data.waterscenes import (WaterScenesDataset,
                                           WaterScenesPaths, collate)
from achelous_tpu.ops.radar_splat import (minmax_normalize, splat_radar_fast,
                                          splat_radar_points)


def notebook_splat_oracle(points, resolution=320):
    """The reference notebook loop, verbatim semantics."""
    m = np.zeros((3, resolution, resolution))
    for ch in range(3):
        for line in points:
            row = int(line[3] / 6)
            col = int(line[4] / 3.375)
            if not (0 <= row < resolution and 0 <= col < resolution):
                continue
            if m[ch][row][col] != 0 and row >= 1:
                row -= 1
            m[ch][row][col] = line[ch]
    return m.transpose(0, 2, 1)


def test_splat_matches_notebook_oracle():
    rng = np.random.RandomState(0)
    n = 200
    pts = np.zeros((n, 5), np.float32)
    pts[:, 0] = rng.uniform(1, 50, n)        # range (nonzero)
    pts[:, 1] = rng.uniform(-10, 10, n)      # doppler
    pts[:, 2] = rng.uniform(1, 30, n)        # rcs
    pts[:, 3] = rng.uniform(0, 1920, n)      # u
    pts[:, 4] = rng.uniform(0, 1080, n)      # v
    # force some collisions
    pts[50:60, 3:5] = pts[0:10, 3:5]
    want = notebook_splat_oracle(pts)        # [3, 320, 320]
    got = np.asarray(splat_radar_points(jnp.asarray(pts)))  # HWC
    np.testing.assert_allclose(np.transpose(got, (2, 0, 1)), want, rtol=1e-6)


def test_splat_fast_last_write_wins():
    pts = np.zeros((3, 5), np.float32)
    pts[:, 3] = 60.0    # same cell: row 10
    pts[:, 4] = 33.75   # col 10
    pts[:, 0] = [1.0, 2.0, 3.0]
    got = np.asarray(splat_radar_fast(jnp.asarray(pts)))
    assert got[10, 10, 0] == 3.0             # last point wins (after swap HW)


def test_splat_cf_layouts_agree():
    """cf=True emits the reference's stored [c, v, u] layout with no
    transpose op; must equal the HWC output transposed (both variants)."""
    rng = np.random.RandomState(1)
    n = 64
    pts = np.zeros((n, 5), np.float32)
    pts[:, 0] = rng.uniform(1, 50, n)
    pts[:, 1] = rng.uniform(-10, 10, n)
    pts[:, 2] = rng.uniform(1, 30, n)
    pts[:, 3] = rng.uniform(0, 1920, n)
    pts[:, 4] = rng.uniform(0, 1080, n)
    pts[20:28, 3:5] = pts[0:8, 3:5]          # collisions
    valid = np.arange(n) < 60
    for fn in (splat_radar_points, splat_radar_fast):
        hwc = np.asarray(fn(jnp.asarray(pts), jnp.asarray(valid)))
        cf = np.asarray(fn(jnp.asarray(pts), jnp.asarray(valid), cf=True))
        assert cf.shape == (3, 320, 320)
        np.testing.assert_array_equal(cf, np.transpose(hwc, (2, 0, 1)))


def test_minmax_normalize():
    x = jnp.asarray([[0.0, 5.0], [10.0, 2.5]])
    y = np.asarray(minmax_normalize(x))
    assert y.min() == 0.0 and y.max() == 1.0


@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    """4-sample WaterScenes-format dataset with images, masks, radar CSVs."""
    from PIL import Image
    root = tmp_path_factory.mktemp("waterscenes")
    img_dir = root / "images"; img_dir.mkdir()
    sem_dir = root / "sem"; sem_dir.mkdir()
    wl_dir = root / "wl"; wl_dir.mkdir()
    csv_dir = root / "radar"; csv_dir.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        name = f"img{i}"
        im = Image.fromarray(rng.randint(0, 255, (1080, 1920, 3), np.uint8))
        im.save(img_dir / f"{name}.jpg")
        Image.fromarray(rng.randint(0, 9, (1080, 1920), np.uint8)).save(
            sem_dir / f"{name}.png")
        if i != 2:   # sample 2 has a missing waterline mask
            Image.fromarray(rng.randint(0, 2, (1080, 1920), np.uint8)).save(
                wl_dir / f"{name}.png")
        with open(csv_dir / f"{name}.csv", "w") as f:
            f.write("x,y,z,comp_velocity,rcs,range,doppler,u,v,label\n")
            for _ in range(rng.randint(5, 40)):
                vals = rng.uniform(1, 10, 7)   # x,y,z,comp_velocity,rcs,range,doppler
                u, v = rng.uniform(0, 1919), rng.uniform(0, 1079)
                f.write(",".join(map(str, list(vals) + [u, v])) +
                        f",{rng.randint(0, 8)}\n")
        n_box = rng.randint(1, 4)
        bs = []
        for _ in range(n_box):
            x1, y1 = rng.randint(0, 1600), rng.randint(0, 800)
            bs.append(f"{x1},{y1},{x1 + rng.randint(60, 300)},"
                      f"{y1 + rng.randint(60, 200)},{rng.randint(0, 7)}")
        lines.append(f"{img_dir / (name + '.jpg')} " + " ".join(bs))
    ann = root / "train.txt"
    ann.write_text("\n".join(lines))
    return WaterScenesPaths(annotation_file=str(ann),
                            semantic_dir=str(sem_dir),
                            waterline_dir=str(wl_dir),
                            radar_csv_dir=str(csv_dir))


def test_dataset_and_collate(fixture_dataset):
    cfg = AchelousConfig(phi="S0", resolution=320)
    ds = WaterScenesDataset(cfg, fixture_dataset, max_gt=10)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (320, 320, 3)
    assert s["seg"].shape == (320, 320) and s["seg"].max() <= cfg.num_seg
    assert s["wl"].max() <= 2
    assert s["pc"].shape == (512, 5)
    # per-column L2 normalization
    np.testing.assert_allclose(np.linalg.norm(s["pc"], axis=0), 1.0,
                               atol=1e-5)
    assert len(s["boxes"]) >= 1
    # cxcywh within the canvas
    assert (s["boxes"][:, 0] >= 0).all() and (s["boxes"][:, 0] <= 320).all()

    batch = collate([ds[i] for i in range(4)], cfg, max_gt=10)
    assert batch["image"].shape == (4, 320, 320, 3)
    assert batch["seg_onehot"].shape == (4, 320, 320, cfg.num_seg + 1)
    assert batch["gt_mask"].any()
    assert "radar_points" in batch   # no npz dir -> on-device splat path
    radar = splat_radar_fast(jnp.asarray(batch["radar_points"][0]),
                             jnp.asarray(batch["radar_points_valid"][0]))
    assert radar.shape == (320, 320, 3)
    assert float(jnp.abs(radar).sum()) > 0


def test_missing_waterline_yields_black_mask(fixture_dataset):
    cfg = AchelousConfig(phi="S0", resolution=320)
    ds = WaterScenesDataset(cfg, fixture_dataset, max_gt=10)
    s = ds[2]
    assert s["wl"].max() == 0   # synthesized black png
