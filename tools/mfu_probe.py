"""MFU / FLOPs reconciliation probe (VERDICT r2 weak 2).

Round 2 shipped mutually inconsistent performance claims: BENCH_SWEEP said
flops_bs1=6.85e9 and 43,211 fps at bs=32 (=296 TFLOP/s, above the v5e's
197 TFLOP/s bf16 peak) while ARCHITECTURE.md claimed ~32% MXU.  Root
cause (found 2026-08-17, tools/axon_timing_probe.py): on the axon tunnel
jax.block_until_ready returns at ENQUEUE, so every wall-clock loop was a
dispatch-rate measurement.  XLA's cost-analysis FLOPs are NOT the problem
— tools/flops_calibrate.py measured cost_analysis/algorithmic = 1.000 for
a matmul and 0.992 for a 3x3 conv.

This probe reports, with fetch-forced slope timing
(utils/profiling.device_time_per_iter):
  * cost-analysis FLOPs for fwd / fwd+decode / fwd+decode+NMS at bs=1/32,
  * true device seconds per batch for the same three programs at bs=1/32,
  * the implied TFLOP/s and MFU against the v5e's 197 TFLOP/s bf16 peak.

Prints one JSON document; `--out MFU.json` commits the artifact.

v5e bf16 peak: 197 TFLOP/s (public spec).  Reference FPS convention:
nets/Achelous.py:111-116 (whole detections).
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

V5E_BF16_PEAK = 197e12


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--config", default="EN-GDF-PN-S0")
    args = ap.parse_args(argv)

    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.ops.postprocess import (decode_outputs,
                                              non_max_suppression)
    from achelous_tpu.utils.profiling import (_tiny_scalar,
                                              device_time_per_iter,
                                              flops_of)
    from tools.bench_sweep import parse_name

    cfg = AchelousConfig(resolution=320, dtype=jnp.bfloat16,
                         **parse_name(args.config))
    model = create_model(cfg)
    r = cfg.resolution
    rng = np.random.RandomState(0)

    def inputs(bs):
        return (jnp.asarray(rng.rand(bs, r, r, 3), jnp.bfloat16),
                jnp.asarray(rng.rand(bs, r, r, 3), jnp.bfloat16),
                jnp.asarray(rng.rand(bs, cfg.pc_points, cfg.pc_channels),
                            jnp.bfloat16))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs(1))

    def fwd(v, image, radar, pc):
        return model.apply(v, image, radar, pc)

    def fwd_decode(v, image, radar, pc):
        det, sem, lane, pcseg = model.apply(v, image, radar, pc)
        return decode_outputs(det, (r, r)), sem, lane, pcseg

    def full(v, image, radar, pc):
        det, sem, lane, pcseg = model.apply(v, image, radar, pc)
        decoded = decode_outputs(det, (r, r))
        return (non_max_suppression(decoded, cfg.num_det, 0.35, 0.35),
                sem, lane, pcseg)

    programs = {"fwd": fwd, "fwd_decode": fwd_decode, "full": full}
    out = {"config": args.config, "device": str(jax.devices()[0]),
           "backend": jax.default_backend(), "peak_bf16": V5E_BF16_PEAK,
           "method": "fetch-forced fori_loop slope "
                     "(utils/profiling.device_time_per_iter)"}

    for name, fn in programs.items():
        out[f"flops_{name}_bs1"] = flops_of(fn, variables, *inputs(1))
        out[f"flops_{name}_bs32"] = flops_of(fn, variables, *inputs(32))

    def make_step(fn):
        def step(carry):
            res = fn(variables, *carry)
            s = _tiny_scalar(res) * jnp.float32(1e-12)
            return tuple(a + s.astype(a.dtype) for a in carry)
        return step

    for name, fn in programs.items():
        for bs, ns in ((1, (50, 250)), (32, (10, 50))):
            t = device_time_per_iter(make_step(fn), inputs(bs),
                                     n1=ns[0], n2=ns[1], repeats=3)
            out[f"time_{name}_bs{bs}_s"] = round(t, 6)
            out[f"fps_{name}_bs{bs}"] = round(bs / t, 1)
            achieved = out[f"flops_{name}_bs{bs}"] / t
            out[f"tflops_{name}_bs{bs}"] = round(achieved / 1e12, 2)
            out[f"mfu_{name}_bs{bs}"] = round(achieved / V5E_BF16_PEAK, 4)

    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
