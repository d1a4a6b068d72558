"""Per-branch device-time ablation of the flagship inference pipeline.

Times each standalone stage of EN-GDF-PN-S0 (vision backbone, backbone+FPN,
RCNet radar encoder, PointNet, full fwd, fwd+decode, fwd+decode+NMS) with
fetch-forced slope timing (utils/profiling.device_time_per_iter) at bs=1 and
bs=32, to aim bs=1 latency work: the headline bench (bench.py) is the bs=1
full pipeline, reference convention nets/Achelous.py:111-116.

Stage deltas across separately-jitted programs are approximate (XLA fuses
across module boundaries inside the full program) but localize the cost.

Usage: python tools/latency_ablation.py [--config EN-GDF-PN-S0] [--out F]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="EN-GDF-PN-S0")
    ap.add_argument("--out", default="")
    ap.add_argument("--batches", default="1,32")
    ap.add_argument("--resolution", type=int, default=320)
    args = ap.parse_args(argv)

    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model, make_backbone
    from achelous_tpu.models.necks import DualFPN
    from achelous_tpu.models.pointnet import PointNetSeg
    from achelous_tpu.models.rcnet import RCNet
    from achelous_tpu.ops.postprocess import (decode_outputs,
                                              non_max_suppression)
    from achelous_tpu.utils.profiling import (_tiny_scalar,
                                              device_time_per_iter)
    from tools.bench_sweep import parse_name

    cfg = AchelousConfig(resolution=args.resolution, dtype=jnp.bfloat16,
                         **parse_name(args.config))
    r = cfg.resolution
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def img(bs):
        return jnp.asarray(rng.rand(bs, r, r, 3), jnp.bfloat16)

    def pc(bs):
        return jnp.asarray(rng.rand(bs, cfg.pc_points, cfg.pc_channels),
                           jnp.bfloat16)

    # standalone modules
    backbone = make_backbone(cfg)
    fpn = DualFPN(num_seg=cfg.num_seg, phi=cfg.phi, family=cfg.neck,
                  use_spp=cfg.use_spp, dtype=cfg.dtype)
    rcnet = RCNet(phi=cfg.phi, band=cfg.deform_band, dtype=cfg.dtype)
    pnet = PointNetSeg(num_classes=cfg.pc_classes, dtype=cfg.dtype)
    model = create_model(cfg)

    v_bb = jax.jit(backbone.init)(key, img(1))
    feats1 = jax.jit(lambda v, x: backbone.apply(v, x))(v_bb, img(1))
    v_fpn = jax.jit(fpn.init, static_argnums=2)(key, feats1, False)
    v_rc = jax.jit(rcnet.init)(key, img(1))
    v_pn = jax.jit(pnet.init)(key, pc(1))
    v_full = jax.jit(model.init)(key, img(1), img(1), pc(1))

    def perturbed(fn):
        """carry -> carry with every input perturbed by a function of the
        outputs (XLA hoists any loop-invariant branch)."""
        def step(carry):
            out = fn(*carry)
            s = _tiny_scalar(out) * jnp.float32(1e-12)
            return tuple(a + s.astype(a.dtype) for a in carry)
        return step

    stages = {
        "backbone": (lambda x: backbone.apply(v_bb, x), lambda bs: (img(bs),)),
        "backbone_fpn": (
            lambda x: fpn.apply(v_fpn, backbone.apply(v_bb, x), False),
            lambda bs: (img(bs),)),
        "rcnet": (lambda x: rcnet.apply(v_rc, x), lambda bs: (img(bs),)),
        "pointnet": (lambda x: pnet.apply(v_pn, x), lambda bs: (pc(bs),)),
        "full_fwd": (lambda a, b, c: model.apply(v_full, a, b, c),
                     lambda bs: (img(bs), img(bs), pc(bs))),
        "full_decode": (
            lambda a, b, c: (lambda o: (decode_outputs(o[0], (r, r)),)
                             + o[1:])(model.apply(v_full, a, b, c)),
            lambda bs: (img(bs), img(bs), pc(bs))),
        "full_nms": (
            lambda a, b, c: (lambda o: (non_max_suppression(
                decode_outputs(o[0], (r, r)), cfg.num_det, 0.35, 0.35),)
                + o[1:])(model.apply(v_full, a, b, c)),
            lambda bs: (img(bs), img(bs), pc(bs))),
    }

    out = {"config": args.config, "device": str(jax.devices()[0]),
           "method": "fetch-forced fori_loop slope"}
    for bs_s in args.batches.split(","):
        bs = int(bs_s)
        ns = (50, 250) if bs == 1 else (10, 50)
        for name, (fn, mk) in stages.items():
            t = device_time_per_iter(perturbed(fn), mk(bs),
                                     n1=ns[0], n2=ns[1], repeats=3)
            out[f"{name}_bs{bs}_ms"] = round(t * 1e3, 4)
            print(f"{name} bs={bs}: {t * 1e3:.3f} ms", flush=True)

    # FPS kernel A/B (ops/pointops.py cites this artifact): Pallas
    # sequential-loop kernel vs the XLA fori_loop at PointNet++ shapes
    # (512 points -> 128 centroids, the pn2 config's sampling).
    from achelous_tpu.ops.pointops import farthest_point_sample
    for bs in (1, 32):
        xyz = jnp.asarray(rng.rand(bs, 512, 3), jnp.float32)
        for tag, use_pallas in (("pallas", True), ("xla", False)):
            def fps_step(carry, up=use_pallas):
                (x,) = carry
                idx = farthest_point_sample(x, 128, use_pallas=up)
                s = _tiny_scalar(idx) * jnp.float32(1e-12)
                return (x + s.astype(x.dtype),)
            t = device_time_per_iter(fps_step, (xyz,), n1=10, n2=50,
                                     repeats=3)
            out[f"fps512_128_{tag}_bs{bs}_ms"] = round(t * 1e3, 4)
            print(f"fps {tag} bs={bs}: {t * 1e3:.3f} ms", flush=True)

    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
