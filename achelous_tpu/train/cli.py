"""Training CLI mirroring the reference's train.py flags (train.py:32-57).

Usage:
  python -m achelous_tpu.train.cli --backbone en --neck gdf --phi S0 \\
      --resolution 320 --bs 32 --epoch 100 --data_root /path/to/WaterScenes
"""
from __future__ import annotations

import argparse
import os

import jax


def str2bool(v: str) -> bool:
    return str(v).lower() in ("true", "1", "yes")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Achelous-TPU trainer")
    p.add_argument("--backbone", default="en",
                   choices=["en", "mv", "ef", "ev", "rv", "pf", "mo", "fv"])
    p.add_argument("--neck", default="gdf", choices=["gdf", "cdf", "rdf"])
    p.add_argument("--phi", default="S0", choices=["S0", "S1", "S2", "L"])
    p.add_argument("--pc_model", default="pn", choices=["pn", "pn2"])
    p.add_argument("--is_pc", type=str2bool, default=True)
    p.add_argument("--nd", type=str2bool, default=True,
                   help="nano (lightweight) detection head")
    p.add_argument("--spp", type=str2bool, default=True)
    p.add_argument("--resolution", type=int, default=320)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over N micro-batches of bs/N "
                        "inside the jitted step (one optimizer update per "
                        "step; compiles an N-times-smaller XLA program — "
                        "how bs=32 trains through the axon compile helper, "
                        "TRAIN_COMPILE_BISECT.json)")
    p.add_argument("--epoch", type=int, default=100)
    p.add_argument("--lr_init", type=float, default=0.03)
    p.add_argument("--lr_decay", default="cos", choices=["cos", "step"])
    p.add_argument("--opt", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--pc_num", type=int, default=512)
    p.add_argument("--dice", type=str2bool, default=True)
    p.add_argument("--focal", type=str2bool, default=True)
    p.add_argument("--bf16", type=str2bool, default=True,
                   help="bf16 compute (fp32 params); TPU equivalent of --fp16")
    p.add_argument("--mtl", default="sum",
                   choices=["uncertainty", "sum", "mgda", "cagrad"],
                   help="multi-task weighting; 'sum' is the reference's "
                        "effective behavior and the default — trained "
                        "uncertainty weights suppress the initially "
                        "high-loss detection task (ARCHITECTURE.md "
                        "deviation 2)")
    p.add_argument("--data_root", required=True,
                   help="WaterScenes-format root (see WaterScenesPaths)")
    p.add_argument("--annotation", default="train.txt")
    p.add_argument("--val_annotation", default="val.txt")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--eval_period", type=int, default=10)
    p.add_argument("--save_period", type=int, default=10)
    p.add_argument("--freeze_epoch", type=int, default=0,
                   help="freeze the vision backbone for the first N epochs")
    p.add_argument("--init_type", default="none",
                   choices=["none", "normal", "xavier", "kaiming",
                            "orthogonal"],
                   help="weights_init scheme (reference "
                        "detection_loss.py:466-485); 'none' keeps flax "
                        "fan-in variance-scaling defaults")
    p.add_argument("--init_gain", type=float, default=0.02)
    p.add_argument("--augment", type=str2bool, default=False,
                   help="HSV jitter + modality-consistent horizontal flip "
                        "on the train set (data/augment.py; the reference's "
                        "augmentations are dead code, see ARCHITECTURE.md "
                        "deviation 7)")
    p.add_argument("--mosaic", type=float, default=0.0, metavar="PROB",
                   help="probability of the 4-sample radar-consistent "
                        "mosaic (data/augment.mosaic_samples; rebuilds the "
                        "reference's dead mosaic, dataloader.py:236-487, "
                        "with the raw radar points re-splatted per "
                        "quadrant); implies --augment")
    p.add_argument("--resume", default="",
                   help="checkpoint name under <log_dir>/ckpt to resume from")
    p.add_argument("--deform_band", default="auto",
                   help="deformable-conv offset band: 'auto' (config "
                        "default), 'none' (exact unbounded-offset gather — "
                        "required when fine-tuning torch-transplanted "
                        "weights, OFFSET_DISTRIBUTION.json), or an integer "
                        "cell radius")
    return p


def main(argv=None):
    import jax.numpy as jnp

    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.data.waterscenes import (WaterScenesDataset,
                                               WaterScenesPaths)
    from achelous_tpu.models.achelous import create_model, example_inputs
    from achelous_tpu.train.checkpoints import CheckpointManager
    from achelous_tpu.train.loop import fit
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state)

    args = build_parser().parse_args(argv)
    from achelous_tpu.predict_cli import parse_band
    band = parse_band(args.deform_band)
    cfg_kw = {} if band == "auto" else {"deform_band": band}
    cfg = AchelousConfig(
        backbone=args.backbone, neck=args.neck, phi=args.phi,
        pc_model=args.pc_model, nano_head=args.nd, use_spp=args.spp,
        resolution=args.resolution, pc_points=args.pc_num,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32, **cfg_kw)
    tcfg = TrainConfig(batch_size=args.bs, epochs=args.epoch,
                       lr_init=args.lr_init, lr_decay=args.lr_decay,
                       optimizer=args.opt, focal=args.focal, dice=args.dice,
                       mtl=args.mtl, freeze_epochs=args.freeze_epoch,
                       init_type=None if args.init_type == "none"
                       else args.init_type, init_gain=args.init_gain,
                       grad_accum=args.grad_accum)

    def paths(annotation):
        return WaterScenesPaths(
            annotation_file=os.path.join(args.data_root, annotation),
            semantic_dir=os.path.join(args.data_root, "semantic"),
            waterline_dir=os.path.join(args.data_root, "waterline"),
            radar_map_dir=os.path.join(args.data_root, "radar_map"),
            radar_csv_dir=os.path.join(args.data_root, "radar"))

    acfg = None
    if args.augment or args.mosaic > 0:
        from achelous_tpu.data.augment import AugmentConfig
        acfg = AugmentConfig(mosaic_prob=args.mosaic)
    train_ds = WaterScenesDataset(cfg, paths(args.annotation), augment=acfg)
    val_path = os.path.join(args.data_root, args.val_annotation)
    val_ds = WaterScenesDataset(cfg, paths(args.val_annotation)) \
        if os.path.exists(val_path) else None

    model = create_model(cfg, with_pc=args.is_pc)
    state = None
    if args.resume:
        state = create_train_state(model, cfg, tcfg, jax.random.PRNGKey(0),
                                   example_inputs(cfg, 2))
        state = CheckpointManager(os.path.join(args.log_dir, "ckpt")).restore(
            args.resume, state)
    print(f"training {cfg.name} on {len(train_ds)} samples "
          f"({jax.device_count()} device(s))")
    fit(model, cfg, tcfg, train_ds, val_ds, log_dir=args.log_dir,
        eval_period=args.eval_period, save_period=args.save_period,
        state=state)


if __name__ == "__main__":
    main()
