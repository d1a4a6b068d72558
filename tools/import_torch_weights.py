"""Import a reference Achelous torch checkpoint into achelous_tpu.

The reference trainer saves plain ``state_dict`` .pth files and loads them
with a name+shape filter (reference train.py:353-370).  This tool maps such a
checkpoint into this package's flax variable tree via the mapping engine in
achelous_tpu/utils/torch_import.py and writes a flax msgpack checkpoint that
AchelousPredictor / the trainer can consume.

Usage:
  python tools/import_torch_weights.py --pth best_epoch_weights.pth \
      --out weights.msgpack --phi S0 --backbone en --neck gdf [--partial]

--partial mirrors the reference's filtered load: mapped keys missing from the
state_dict are skipped instead of raising.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_state_dict(path: str) -> dict:
    """Load a torch .pth into a {name: np.ndarray} dict (torch-cpu)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def import_torch_checkpoint(state_dict: dict, cfg, with_pc: bool = True,
                            strict: bool = True) -> dict:
    """state_dict -> flax variables for `create_model(cfg)` (fp32)."""
    import jax
    import jax.numpy as jnp
    from achelous_tpu.models.achelous import create_model, example_inputs
    from achelous_tpu.utils.torch_import import achelous_mapping, transplant

    import dataclasses
    cfg32 = dataclasses.replace(cfg, dtype=jnp.float32)
    model = create_model(cfg32, with_pc=with_pc)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    *example_inputs(cfg32, 1))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    mapping = achelous_mapping(cfg.phi, cfg.backbone, cfg.neck,
                               with_pc=with_pc)
    return transplant(variables, state_dict, mapping, strict=strict)


META_KEY = "__achelous_meta__"


def save_variables(variables: dict, path: str, meta: dict | None = None
                   ) -> None:
    """Write flax variables as msgpack, with an optional provenance stamp.

    `meta` (str->str) is stored under META_KEY inside the same file.  The
    transplant path stamps provenance="torch-transplant": reference
    checkpoints were trained with UNBOUNDED deform offsets and measured
    trained offsets exceed the banded default of +-4 cells on 17.9% of taps
    (OFFSET_DISTRIBUTION.json), so loaders must auto-select
    deform_band=None for them (achelous_tpu/predict.load_weights does)."""
    from flax import serialization
    doc = dict(variables)
    if meta:
        doc[META_KEY] = {str(k): str(v) for k, v in meta.items()}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(doc))


def load_variables(path: str) -> dict:
    """Restore variables only (meta stripped); see predict.load_weights for
    the meta-aware loader."""
    from achelous_tpu.predict import load_weights
    return load_weights(path)[0]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--phi", default="S0")
    ap.add_argument("--backbone", default="en")
    ap.add_argument("--neck", default="gdf")
    ap.add_argument("--pc_model", default="pn")
    ap.add_argument("--resolution", type=int, default=320)
    ap.add_argument("--num_det", type=int, default=7)
    ap.add_argument("--num_seg", type=int, default=9)
    ap.add_argument("--no_pc", action="store_true",
                    help="3-task Achelous3T checkpoint")
    ap.add_argument("--partial", action="store_true",
                    help="skip mapped keys missing from the .pth (reference "
                         "train.py:353-370 filtered-load behavior)")
    args = ap.parse_args(argv)

    from achelous_tpu.core.config import AchelousConfig
    cfg = AchelousConfig(phi=args.phi, backbone=args.backbone, neck=args.neck,
                         pc_model=args.pc_model, resolution=args.resolution,
                         num_det=args.num_det, num_seg=args.num_seg)
    sd = load_state_dict(args.pth)
    variables = import_torch_checkpoint(sd, cfg, with_pc=not args.no_pc,
                                        strict=not args.partial)
    save_variables(variables, args.out,
                   meta={"provenance": "torch-transplant",
                         "source": os.path.basename(args.pth),
                         "config_name": cfg.name,
                         "deform_band": "none"})
    n = sum(v.size for v in
            __import__("jax").tree_util.tree_leaves(variables["params"]))
    print(f"imported {len(sd)} torch tensors -> {args.out} "
          f"({n / 1e6:.2f}M params)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
