"""Capture a jax.profiler trace of the flagship inference step (VERDICT r2
next-1b: back the MFU figure with a trace artifact).

Writes a TensorBoard-format trace directory (protobuf .xplane.pb) under
--out; TensorBoard itself is not in this image, so the artifact is recorded
for offline inspection and the quantitative MFU claim remains
tools/mfu_probe.py's fetch-forced device timing (see
utils/profiling.device_time_per_iter for why wall-clock loops are invalid
on the axon tunnel).

Usage: python tools/capture_trace.py [--bs 32] [--out traces/]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="traces")
    args = ap.parse_args(argv)

    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.ops.postprocess import decode_outputs, non_max_suppression
    from tools.bench_sweep import parse_name

    cfg = AchelousConfig(resolution=320, dtype=jnp.bfloat16,
                         **parse_name(args.config))
    model = create_model(cfg)
    r = cfg.resolution
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(args.bs, r, r, 3), jnp.bfloat16)
    # radar CF [B,3,R,R] — the production layout benched by bench.py /
    # tools/bench_sweep.py (reference feeds NCHW; the on-device splat and
    # predict.py's npz load both emit CF), so the trace matches the bench
    rad = jnp.asarray(rng.rand(args.bs, 3, r, r), jnp.bfloat16)
    pc = jnp.asarray(rng.rand(args.bs, cfg.pc_points, cfg.pc_channels),
                     jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, rad, pc)

    @jax.jit
    def full(v, image, radar, p):
        det, sem, lane, pcseg = model.apply(v, image, radar, p)
        decoded = decode_outputs(det, (r, r))
        return (non_max_suppression(decoded, cfg.num_det, 0.35, 0.35),
                sem, lane, pcseg)

    out = jax.block_until_ready(full(variables, img, rad, pc))  # compile

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = full(variables, img, rad, pc)
        jax.block_until_ready(out)
        # force completion inside the trace window (enqueue-fake-ready on
        # the axon tunnel; see bench.py TIMING METHODOLOGY)
        float(jnp.sum(out[1][:1, :1, :1]))
    print("trace written under", args.out)


if __name__ == "__main__":
    main()
