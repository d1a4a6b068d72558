"""A/B the RCNet RadarConv implementation choices across batch sizes.

The fused Pallas RadarConv kernel (ops/pallas_deform.py) wins at bs=1 by
eliminating the XLA-side tiny-channel convs and layout copies, but the
full-config sweep showed it LOSING at bs=32 (574.9 vs 741.4 fps full
pipeline) — at a large batch the XLA convs batch efficiently while the
kernel cost stays linear.  This tool measures RCNet-S0 alone (the component
the choice affects) under each (batch, variant) cell with fetch-forced
device timing to place the fuse batch cap (ACHELOUS_DEFORM_FUSE_MAX_BATCH).

Variants:
  fused_cf    fusion on (cin<=cap blocks) + CF chaining   [candidate small-bs]
  unfused_cf  fusion off, CF chaining + cf-in/out sampling [candidate large-bs]
  unfused_nhwc fusion off, NHWC chaining (the r3 path)     [baseline]

Usage: python tools/radarconv_batch_ab.py [--batches 1,4,8,32] [--out F]
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
    ap.add_argument("--batches", default="1,4,8,32")
    ap.add_argument("--resolution", type=int, default=320)
    ap.add_argument("--phi", default="S0",
                    help="width size whose RCNet to A/B — the gate constants "
                         "were calibrated on S0 only (VERDICT r4 weak 7); "
                         "S1/S2 run cin up to 30/36 in the stage tails")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    from achelous_tpu.models.rcnet import RCNet
    from achelous_tpu.utils.profiling import (_tiny_scalar,
                                              device_time_per_iter)

    res = args.resolution
    results = {"device": str(jax.devices()[0]), "resolution": res,
               "phi": args.phi, "cells": []}
    rng = np.random.RandomState(0)

    for bs in [int(b) for b in args.batches.split(",")]:
        x = jnp.asarray(rng.rand(bs, res, res, 3), jnp.bfloat16)
        for variant, fuse_cap, cf in (("fused_cf", None, None),
                                      ("unfused_cf", "0", True),
                                      ("unfused_nhwc", "0", False)):
            if fuse_cap is None:
                os.environ.pop("ACHELOUS_DEFORM_FUSE_MAX_CIN", None)
            else:
                os.environ["ACHELOUS_DEFORM_FUSE_MAX_CIN"] = fuse_cap
            model = RCNet(phi=args.phi, band=4, cf=cf, dtype=jnp.bfloat16)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

            def step(carry, model=model, variables=variables):
                # carry -> carry with a data dependency on the input so the
                # loop body is never hoisted (see bench.py step)
                xx, = carry
                outs = model.apply(variables, xx)
                s = _tiny_scalar(outs) * jnp.float32(1e-12)
                return (xx + s.astype(xx.dtype),)

            n1, n2 = (40, 200) if bs == 1 else (10, 50)
            t = device_time_per_iter(step, (x,), n1=n1, n2=n2, repeats=3)
            cell = {"bs": bs, "variant": variant,
                    "ms_per_batch": round(t * 1e3, 4),
                    "ms_per_frame": round(t / bs * 1e3, 4)}
            results["cells"].append(cell)
            print(json.dumps(cell), flush=True)
    os.environ.pop("ACHELOUS_DEFORM_FUSE_MAX_CIN", None)

    line = json.dumps(results)
    print(line)
    if args.out:
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            f.write(line + "\n")
        os.replace(tmp, args.out)


if __name__ == "__main__":
    main()
