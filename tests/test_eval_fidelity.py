"""Eval-fidelity guards (VERDICT round 1, item 4):

  * batches_from(drop_last=False) visits every sample exactly once,
  * seg/waterline mIoU is scored un-letterboxed at original resolution
    (reference utils_seg/callbacks.py:169-186),
  * evaluate_epoch is sample-count-exact for any batch size.
"""
import numpy as np
import jax
import pytest

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.data.waterscenes import (WaterScenesDataset,
                                           WaterScenesPaths, letterbox)
from achelous_tpu.train.loop import (batches_from, evaluate_epoch,
                                     unletterbox_argmax)


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    """5-sample WaterScenes fixture at 96x128 native resolution (so the
    64-px letterbox has real gray bars)."""
    from PIL import Image
    root = tmp_path_factory.mktemp("ws_eval")
    img_dir = root / "images"; img_dir.mkdir()
    sem_dir = root / "sem"; sem_dir.mkdir()
    wl_dir = root / "wl"; wl_dir.mkdir()
    csv_dir = root / "radar"; csv_dir.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(5):
        name = f"img{i}"
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
            img_dir / f"{name}.jpg")
        sem = np.zeros((96, 128), np.uint8)
        sem[20:70, 30:90] = 1 + i % 3
        Image.fromarray(sem).save(sem_dir / f"{name}.png")
        wl = np.zeros((96, 128), np.uint8)
        wl[60:, :] = 1
        Image.fromarray(wl).save(wl_dir / f"{name}.png")
        with open(csv_dir / f"{name}.csv", "w") as f:
            f.write("x,y,z,comp_velocity,rcs,range,doppler,u,v,label\n")
            for _ in range(10):
                vals = rng.uniform(1, 10, 7)
                f.write(",".join(map(str, list(vals))) +
                        f",{rng.uniform(0, 1919)},{rng.uniform(0, 1079)},"
                        f"{rng.randint(0, 8)}\n")
        lines.append(f"{img_dir / (name + '.jpg')} 30,20,90,70,{i % 7}")
    ann = root / "train.txt"
    ann.write_text("\n".join(lines))
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", resolution=64)
    paths = WaterScenesPaths(annotation_file=str(ann),
                             semantic_dir=str(sem_dir),
                             waterline_dir=str(wl_dir),
                             radar_csv_dir=str(csv_dir))
    return cfg, WaterScenesDataset(cfg, paths, max_gt=8)


def test_batches_cover_every_sample_once(tiny_ds):
    cfg, ds = tiny_ds
    rng = np.random.RandomState(0)
    seen = []
    for batch in batches_from(ds, cfg, 2, 8, False, rng, drop_last=False):
        seen.extend(batch["indices"][:batch["n_valid"]])
        assert len(batch["image"]) == 2          # static shape incl. tail
    assert sorted(seen) == list(range(5))

    # drop_last=True keeps the reference DataLoader behavior
    n = sum(1 for _ in batches_from(ds, cfg, 2, 8, False, rng))
    assert n == 2


def test_batches_pad_wraps_tiny_dataset(tiny_ds):
    cfg, ds = tiny_ds
    rng = np.random.RandomState(0)
    batches = list(batches_from(ds, cfg, 8, 8, False, rng, drop_last=False))
    assert len(batches) == 1
    assert batches[0]["n_valid"] == 5
    assert len(batches[0]["indices"]) == 8


def test_original_masks_native_resolution(tiny_ds):
    cfg, ds = tiny_ds
    seg, wl = ds.original_masks(0)
    assert seg.shape == (96, 128) and wl.shape == (96, 128)
    assert set(np.unique(seg)) <= {0, 1, 2, 3}
    # letterboxed train labels are 64x64; eval labels stay native
    assert ds[0]["seg"].shape == (64, 64)


def test_unletterbox_argmax_roundtrip(tiny_ds):
    """Letterbox a label map, one-hot it as probs, unletterbox -> recovers
    the original labels (up to resampling at region borders)."""
    from PIL import Image
    cfg, ds = tiny_ds
    seg, _ = ds.original_masks(1)
    m = Image.fromarray(seg.astype(np.uint8))
    lb, _, _ = letterbox(m, (64, 64), resample=Image.NEAREST)
    lab = np.asarray(lb).astype(np.int32)
    prob = np.eye(cfg.num_seg, dtype=np.float32)[lab]
    rec = unletterbox_argmax(prob, seg.shape)
    assert rec.shape == seg.shape
    agree = float((rec == seg).mean())
    assert agree > 0.97, agree


def test_evaluate_epoch_scores_every_image(tiny_ds):
    from achelous_tpu.models.achelous import create_model, example_inputs
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state)
    cfg, ds = tiny_ds
    model = create_model(cfg)
    state = create_train_state(model, cfg, TrainConfig(max_gt=8),
                               jax.random.PRNGKey(0), example_inputs(cfg, 2))
    m = evaluate_epoch(model, cfg, state, ds, batch_size=2, use_ema=False,
                       class_names=("pier", "buoy"))
    assert m["n_images"] == 5                    # 2+2+1: tail not dropped
    for k in ("mAP50", "miou_sem", "miou_wl", "miou_pc"):
        assert np.isfinite(m[k])
    # per-class breakdowns reach the epoch record (VERDICT r2 missing 5):
    # per-class AP50 for every det class, LAMR for classes with GT, and
    # per-class IoU/PA for seg + pc — all scalar-keyed for history.jsonl.
    for c in range(cfg.num_det):
        name = ("pier", "buoy")[c] if c < 2 else f"c{c}"
        assert f"ap50/{name}" in m
    assert any(k.startswith("lamr/") for k in m)
    for c in range(cfg.num_seg):
        assert f"iou_sem/{c}" in m and f"pa_sem/{c}" in m
    for c in range(cfg.pc_classes):
        assert f"iou_pc/{c}" in m
    assert all(np.isscalar(v) for v in m.values())
