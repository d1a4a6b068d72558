"""Synthetic batches in the exact training-batch layout — used by tests,
the multi-chip dry run, and benchmarking without the WaterScenes dataset."""
from __future__ import annotations

import numpy as np

from achelous_tpu.core.config import AchelousConfig


def synthetic_batch(cfg: AchelousConfig, batch_size: int, max_gt: int = 50,
                    seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    r = cfg.resolution
    n_gt = rng.randint(1, min(6, max_gt), size=batch_size)
    gt_boxes = np.zeros((batch_size, max_gt, 4), np.float32)
    gt_classes = np.zeros((batch_size, max_gt), np.int32)
    gt_mask = np.zeros((batch_size, max_gt), bool)
    for i, n in enumerate(n_gt):
        gt_boxes[i, :n, 0] = rng.uniform(16, r - 16, n)
        gt_boxes[i, :n, 1] = rng.uniform(16, r - 16, n)
        gt_boxes[i, :n, 2:4] = rng.uniform(8, 64, (n, 2))
        gt_classes[i, :n] = rng.randint(0, cfg.num_det, n)
        gt_mask[i, :n] = True
    seg = rng.randint(0, cfg.num_seg + 1, (batch_size, r, r)).astype(np.int32)
    wl = rng.randint(0, 3, (batch_size, r, r)).astype(np.int32)
    return {
        "image": rng.rand(batch_size, r, r, cfg.image_channels).astype(np.float32),
        "radar": rng.rand(batch_size, r, r, cfg.radar_channels).astype(np.float32),
        "pc": rng.rand(batch_size, cfg.pc_points, cfg.pc_channels).astype(np.float32),
        "gt_boxes": gt_boxes, "gt_classes": gt_classes, "gt_mask": gt_mask,
        "seg_labels": seg,
        "seg_onehot": np.eye(cfg.num_seg + 1, dtype=np.float32)[seg],
        "wl_labels": wl,
        "wl_onehot": np.eye(3, dtype=np.float32)[wl],
        "pc_labels": rng.randint(0, cfg.pc_classes,
                                 (batch_size, cfg.pc_points)).astype(np.int32),
    }
