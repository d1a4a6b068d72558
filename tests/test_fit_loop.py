"""End-to-end fit() smoke: epoch loop + prefetch + history + checkpoints +
exact resume (reference train.py:637-703 orchestration)."""
import json
import os

import numpy as np
import pytest

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.data.waterscenes import WaterScenesDataset, WaterScenesPaths
from achelous_tpu.train.train_state import TrainConfig


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("ws_fit")
    img_dir = root / "images"; img_dir.mkdir()
    sem_dir = root / "sem"; sem_dir.mkdir()
    wl_dir = root / "wl"; wl_dir.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(5):
        name = f"img{i}"
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
            img_dir / f"{name}.jpg")
        sem = np.zeros((96, 128), np.uint8); sem[20:70, 30:90] = 1
        Image.fromarray(sem).save(sem_dir / f"{name}.png")
        wl = np.zeros((96, 128), np.uint8); wl[60:, :] = 1
        Image.fromarray(wl).save(wl_dir / f"{name}.png")
        lines.append(f"{img_dir / (name + '.jpg')} 30,20,90,70,{i % 7}")
    ann = root / "train.txt"
    ann.write_text("\n".join(lines))
    cfg = AchelousConfig(resolution=64, pc_points=16)
    paths = WaterScenesPaths(annotation_file=str(ann),
                             semantic_dir=str(sem_dir),
                             waterline_dir=str(wl_dir))
    return cfg, WaterScenesDataset(cfg, paths, max_gt=8)


@pytest.mark.slow   # full fit() compile: minutes on cold XLA:CPU
def test_fit_runs_and_resumes(tiny_ds, tmp_path):
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.train.checkpoints import CheckpointManager
    from achelous_tpu.train.loop import fit

    cfg, ds = tiny_ds
    model = create_model(cfg)
    tcfg = TrainConfig(batch_size=2, epochs=2, max_gt=8, lr_init=0.01)
    log_dir = str(tmp_path / "logs")
    msgs = []
    state = fit(model, cfg, tcfg, ds, None, log_dir=log_dir, epochs=2,
                save_period=1, progress=msgs.append)
    assert int(state.epoch) == 2
    assert int(state.step) == 2 * (len(ds) // 2)
    assert len(msgs) == 2

    hist = [json.loads(l) for l in
            open(os.path.join(log_dir, "history.jsonl"))]
    assert [h["epoch"] for h in hist] == [0, 1]
    assert all(np.isfinite(h["loss"]) for h in hist)

    # resume: restore 'last' and continue one more epoch — the explicit
    # epoch field (not step arithmetic) must drive the loop
    restored = CheckpointManager(os.path.join(log_dir, "ckpt")).restore(
        "last_epoch_weights", state)
    assert int(restored.epoch) == 2
    state3 = fit(model, cfg, tcfg, ds, None, log_dir=log_dir, epochs=3,
                 save_period=5, state=restored, progress=msgs.append)
    assert int(state3.epoch) == 3
    assert len(msgs) == 3     # exactly ONE more epoch ran


def test_history_plots_metric_curves(tmp_path):
    """LossHistory must write the reference's per-epoch curve pngs:
    epoch_loss.png (utils/callbacks.py:56-83), epoch_map.png (:279-290) and
    epoch_miou.png (utils_seg/callbacks.py:234-245) — metric keys appear
    only on eval epochs, loss keys every epoch."""
    pytest.importorskip("matplotlib")
    from achelous_tpu.train.loop import LossHistory

    h = LossHistory(str(tmp_path))
    h.append(0, loss=2.0, val_loss=2.2)
    h.append(1, loss=1.5, val_loss=1.8, **{"mAP50": 0.3, "mAP50-95": 0.2},
             miou_sem=0.5, miou_wl=0.7, miou_pc=0.4)
    h.append(2, loss=1.2, val_loss=1.6)
    h.append(3, loss=1.0, val_loss=1.5, **{"mAP50": 0.5, "mAP50-95": 0.3},
             miou_sem=0.6, miou_wl=0.8, miou_pc=0.5)
    for png in ("epoch_loss.png", "epoch_map.png", "epoch_miou.png"):
        assert os.path.exists(os.path.join(str(tmp_path), png)), png
