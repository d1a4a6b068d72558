"""MFU methodology crosscheck: time KNOWN-cost workloads with the same
fetch-forced fori_loop slope recipe used by mfu_probe/bench_sweep and
report the implied TFLOP/s ladder.

Why this exists: an earlier MFU.json run implied ~100% of the v5e's
197 TFLOP/s bf16 peak for the full EN-GDF-PN-S0 forward at bs=32 — not
physically plausible for a depthwise-heavy mobile net (depthwise convs run
on the VPU at a small fraction of MXU peak).  The pure-matmul validation of
the same recipe gave a sane 89% (tools/axon_timing_probe.py), so the
suspicion falls on element-level pruning of the timed program
(slice-sinking through the model's elementwise tails — since hardened in
utils/profiling._tiny_scalar to full-sum reductions) or cost-analysis
FLOPs for specific op classes.  This tool pins per-op-class implied rates:

  * big matmul 4096^3 bf16         — MXU roofline sanity (expect ~85-90%)
  * pointwise (1x1) convs at the model's stage shapes — MXU, narrow C
  * depthwise 3x3 convs at stage shapes — VPU-bound, expect single-digit %
  * dense 3x3 conv at a stem-like shape
  * full model fwd (same as mfu_probe) for direct comparison

A model whose implied TFLOP/s exceeds the flops-weighted blend of its
parts indicates the timed loop is still dropping work.  Run on the real
TPU: `python tools/mfu_crosscheck.py --out MFU_CROSSCHECK.json`.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12


def _measure(step, carry, flops_per_iter, n1, n2, repeats=3):
    from achelous_tpu.utils.profiling import device_time_per_iter
    t = device_time_per_iter(step, carry, n1=n1, n2=n2, repeats=repeats)
    # Linearity check: a valid slope must be the same between (n1, n2) and
    # (n2, 2*n2 - n1) — if the second segment disagrees, the "slope" is an
    # artifact (e.g. the fetch not actually forcing loop completion), not
    # device time.  This is the internal-consistency probe for the
    # 1.06 ms-vs-20.7 ms full-fwd/RCNet contradiction in the first MFU run.
    t2 = device_time_per_iter(step, carry, n1=n2, n2=2 * n2 - n1,
                              repeats=repeats)
    return {"s_per_iter": round(t, 8),
            "s_per_iter_seg2": round(t2, 8),
            "linearity": round(t2 / t, 3) if t > 0 else None,
            "flops": flops_per_iter,
            "tflops": round(flops_per_iter / t / 1e12, 2),
            "frac_peak": round(flops_per_iter / t / V5E_BF16_PEAK, 4)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    from achelous_tpu.utils.profiling import _tiny_scalar, flops_of

    rng = np.random.RandomState(0)
    out = {"device": str(jax.devices()[0]),
           "backend": jax.default_backend(),
           "peak_bf16": V5E_BF16_PEAK,
           "method": "fetch-forced fori_loop slope, full-sum carry dep",
           "cases": {}}

    def dep_step(fn):
        """carry -> carry with a full-reduction dependency on fn's output."""
        def step(carry):
            res = fn(*carry)
            s = _tiny_scalar(res) * jnp.float32(1e-12)
            return tuple(a + s.astype(a.dtype) for a in carry)
        return step

    # 1. MXU roofline: 4096^3 bf16 matmul (2*N^3 flops).
    n = 4096
    a = jnp.asarray(rng.rand(n, n), jnp.bfloat16)
    b = jnp.asarray(rng.rand(n, n), jnp.bfloat16)
    out["cases"]["matmul_4096"] = _measure(
        dep_step(lambda x, y: x @ y), (a, b), 2 * n**3, n1=20, n2=100)

    # 2-4. conv ladder at EN-GDF-PN-S0 stage shapes (bs=32, NHWC).
    dn = ("NHWC", "HWIO", "NHWC")
    conv = functools.partial(jax.lax.conv_general_dilated,
                             window_strides=(1, 1), padding="SAME",
                             dimension_numbers=dn)

    def conv_case(name, h, c_in, c_out, k, groups=1, bs=32):
        x = jnp.asarray(rng.rand(bs, h, h, c_in), jnp.bfloat16)
        w = jnp.asarray(rng.rand(k, k, c_in // groups, c_out), jnp.bfloat16)
        fn = lambda xx, ww: conv(xx, ww, feature_group_count=groups)
        fl = flops_of(fn, x, w)
        out["cases"][name] = _measure(dep_step(fn), (x, w), fl,
                                      n1=20, n2=100)
        out["cases"][name]["shape"] = [bs, h, h, c_in, c_out, k, groups]

    conv_case("pointwise_80x80_c96", 80, 96, 96, 1)
    conv_case("pointwise_40x40_c176", 40, 176, 176, 1)
    conv_case("pointwise_10x10_c176", 10, 176, 176, 1)
    conv_case("depthwise3x3_80x80_c96", 80, 96, 96, 3, groups=96)
    conv_case("depthwise3x3_40x40_c176", 40, 176, 176, 3, groups=176)
    conv_case("dense3x3_80x80_c48", 80, 48, 96, 3)

    # 5. Full model fwd at bs=32, identical to mfu_probe's 'fwd' program.
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", pc_model="pn",
                         resolution=320, dtype=jnp.bfloat16)
    model = create_model(cfg)
    r = cfg.resolution
    img = jnp.asarray(rng.rand(32, r, r, 3), jnp.bfloat16)
    rad = jnp.asarray(rng.rand(32, r, r, 3), jnp.bfloat16)
    pc = jnp.asarray(rng.rand(32, cfg.pc_points, cfg.pc_channels),
                     jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, rad, pc)
    fwd = lambda i, ra, p: model.apply(variables, i, ra, p)
    fl = flops_of(fwd, img, rad, pc)
    out["cases"]["model_fwd_bs32"] = _measure(dep_step(fwd), (img, rad, pc),
                                              fl, n1=10, n2=50)
    # bs=1 for the monotonicity invariant: a bs=32 batch can never take
    # LESS device time than a bs=1 batch of the same program family (the
    # first MFU run claimed 1.06 ms at bs=32 vs 3.6 ms at bs=1 — the
    # violation that exposed the artifact).
    i1, r1_, p1 = img[:1], rad[:1], pc[:1]
    fl1 = flops_of(fwd, i1, r1_, p1)
    out["cases"]["model_fwd_bs1"] = _measure(dep_step(fwd), (i1, r1_, p1),
                                             fl1, n1=50, n2=250)

    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
