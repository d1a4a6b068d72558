"""Measure the trained deformable-conv offset distribution (VERDICT r3 next 6).

The banded deform fast path clips offsets to +-`deform_band` cells
(default 4, ops/deform.py; reference dcn.py:29-40 starts them at zero).
ARCHITECTURE.md deviation 8 asserts trained offsets stay well inside the
band from "typical DCN behavior"; this tool replaces that assertion with a
measurement: train the production stack to overfit on the learnable
fixture (the same 8-sample rig as tools/dynamics_overfit_probe.py — no
WaterScenes data ships in this image), then capture every RCNet
`offset_conv` activation over the training images and histogram |offset|.

Writes OFFSET_DISTRIBUTION.json: per-block max/p99/p99.9 plus the fraction
of taps whose |offset| exceeds bands 1..4.

Usage: python tools/offset_distribution.py [--epochs 120] [--out ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")   # tiny 64^2 job; keep it off the
                                            # tunnel (and deterministic)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def collect_offsets(model, variables, img, rad, pc):
    """Run the model with captured intermediates; return {block: offsets}
    where offsets is the [B, H, W, 2K] offset_conv output."""
    _, inter = model.apply(variables, img, rad, pc,
                           capture_intermediates=True, mutable=["intermediates"])

    found = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif "offset_conv" in path:
            # flax stores sown __call__ outputs as a tuple
            arr = tree[0] if isinstance(tree, (tuple, list)) else tree
            found["/".join(p for p in path if p not in
                           ("intermediates", "__call__"))] = np.asarray(arr)

    walk(inter["intermediates"], ())
    return found


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "OFFSET_DISTRIBUTION.json"))
    args = ap.parse_args(argv)

    import test_training_dynamics as T
    T.P_EPOCHS = args.epochs

    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.train.schedule import get_lr_scheduler
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state,
                                                make_train_step)

    rng = np.random.RandomState(7)
    img, rad, pc, boxes, classes, seg, wl, pcl = T._learnable_fixture(rng)
    perms = T._perms(11)

    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf",
                         resolution=T.P_RES, pc_points=T.P_NPTS)
    model = create_model(cfg)
    tcfg = TrainConfig(batch_size=T.P_B, optimizer="sgd", momentum=0.937,
                       weight_decay=T.P_WD, focal=True, dice=True,
                       mtl="sum", max_gt=4)
    state = create_train_state(
        model, cfg, tcfg, jax.random.PRNGKey(0),
        (jnp.asarray(img[:2].transpose(0, 2, 3, 1)),
         jnp.asarray(rad[:2].transpose(0, 2, 3, 1)),
         jnp.asarray(pc[:2].transpose(0, 2, 1))))

    seg1h = np.eye(10, dtype=np.float32)[seg]
    wl1h = np.eye(3, dtype=np.float32)[wl]
    lr_fn = get_lr_scheduler("cos", T.P_LR, T.P_MIN_LR, args.epochs)
    step = jax.jit(make_train_step(model, cfg, tcfg))
    last = None
    for epoch in range(args.epochs):
        lr = jnp.float32(lr_fn(epoch))
        for s in range(0, T.P_N, T.P_B):
            idx = perms[epoch % len(perms)][s:s + T.P_B]
            gt_boxes = np.zeros((T.P_B, 4, 4), np.float32)
            gt_classes = np.zeros((T.P_B, 4), np.int32)
            gt_mask = np.zeros((T.P_B, 4), bool)
            gt_boxes[:, :1] = boxes[idx]
            gt_classes[:, :1] = classes[idx]
            gt_mask[:, :1] = True
            batch = {
                "image": jnp.asarray(img[idx].transpose(0, 2, 3, 1)),
                "radar": jnp.asarray(rad[idx].transpose(0, 2, 3, 1)),
                "pc": jnp.asarray(pc[idx].transpose(0, 2, 1)),
                "gt_boxes": jnp.asarray(gt_boxes),
                "gt_classes": jnp.asarray(gt_classes),
                "gt_mask": jnp.asarray(gt_mask),
                "seg_labels": jnp.asarray(seg[idx].astype(np.int32)),
                "seg_onehot": jnp.asarray(seg1h[idx]),
                "wl_labels": jnp.asarray(wl[idx].astype(np.int32)),
                "wl_onehot": jnp.asarray(wl1h[idx]),
                "pc_labels": jnp.asarray(pcl[idx].astype(np.int32)),
            }
            state, m = step(state, batch, lr)
            last = m
    print("final losses:",
          {k: round(float(v), 4) for k, v in last.items()}, flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    offs = collect_offsets(model, variables,
                           jnp.asarray(img.transpose(0, 2, 3, 1)),
                           jnp.asarray(rad.transpose(0, 2, 3, 1)),
                           jnp.asarray(pc.transpose(0, 2, 1)))

    doc = {"epochs": args.epochs, "resolution": T.P_RES,
           "n_images": int(img.shape[0]),
           "note": "JAX production stack overfit on the 8-sample learnable "
                   "fixture (no WaterScenes data in this image); offsets are "
                   "RCNet offset_conv activations over all training images, "
                   "units = input pixels (cells) as in torchvision "
                   "deform_conv2d",
           "blocks": {}, "global": {}}
    alls = []
    for name, o in sorted(offs.items()):
        a = np.abs(o.astype(np.float64)).ravel()
        alls.append(a)
        doc["blocks"][name] = {
            "max": float(a.max()),
            "p99": float(np.percentile(a, 99)),
            "p999": float(np.percentile(a, 99.9)),
            "mean": float(a.mean()),
        }
    a = np.concatenate(alls)
    doc["global"] = {
        "n_taps": int(a.size),
        "max": float(a.max()),
        "p99": float(np.percentile(a, 99)),
        "p999": float(np.percentile(a, 99.9)),
        "frac_exceeding_band": {str(b): float((a > b).mean())
                                for b in (1, 2, 3, 4)},
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps(doc["global"], indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
