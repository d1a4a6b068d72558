"""Diagnose the r5 CF-feed regression (EN-GDF-PN-S0).

The 14:28 sweep at 9f9c1d2 (NHWC-fed radar, all-anchor class argmax)
measured bs=1 339.1 fps / bs=32 741.0 fps; the 18:45 re-measure at 0a66232
(CF-fed radar, candidate-slab argmax) read 289.3 / 465.4.  Two code deltas
are in play (commit 114fbab):

  1. the radar map fed channels-first + in_cf plumbing through the assembly,
  2. the NMS class argmax moved from all A anchors to the top-P gather slab.

This script attributes the regression in ONE process on the flagship:
forward-only vs full (fwd+decode+NMS), CF vs NHWC radar feed, and the
candidate vs all-anchor argmax (ACHELOUS_NMS_CAND_ARGMAX gate, consulted at
trace time), at bs=1 and bs=32.  Same timing recipe as the sweep
(fetch-forced fori_loop slope, every input perturbed).

HISTORICAL NOTE: the measured verdict (DIAG_CF_REGRESS.json — candidate
argmax +15% end-to-end, CF feed neutral) led to reverting the candidate
argmax and REMOVING the ACHELOUS_NMS_CAND_ARGMAX gate from
ops/postprocess.py, so re-running this script today measures the same
(all-anchor) argmax in both cells; re-add the gate to reproduce the A/B.

Usage: PYTHONPATH=/root/.axon_site python tools/diag_cf_regress.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.ops.postprocess import (decode_outputs,
                                              non_max_suppression)
    from achelous_tpu.utils.profiling import _tiny_scalar, device_time_per_iter

    cfg = AchelousConfig(resolution=320, dtype=jnp.bfloat16, backbone="en",
                         neck="gdf", pc_model="pn", phi="S0")
    model = create_model(cfg)
    r = cfg.resolution
    rng = np.random.RandomState(0)

    def inputs(bs, cf):
        rad = rng.rand(bs, 3, r, r) if cf else rng.rand(bs, r, r, 3)
        return (jnp.asarray(rng.rand(bs, r, r, 3), jnp.bfloat16),
                jnp.asarray(rad, jnp.bfloat16),
                jnp.asarray(rng.rand(bs, cfg.pc_points, cfg.pc_channels),
                            jnp.bfloat16))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs(1, True))

    def make_step(with_post):
        def step(carry):
            img, rad, pc = carry
            det, sem, lane, pcseg = model.apply(variables, img, rad, pc)
            if with_post:
                decoded = decode_outputs(det, (r, r))
                nms = non_max_suppression(decoded, cfg.num_det, 0.35, 0.35)
                s = _tiny_scalar((nms, sem, lane, pcseg))
            else:
                s = _tiny_scalar((det, sem, lane, pcseg))
            s = s * jnp.float32(1e-12)
            return (img + s.astype(img.dtype), rad + s.astype(rad.dtype),
                    pc + s.astype(pc.dtype))
        return step

    results = []
    cells = [
        # (label, cf_feed, with_post, cand_argmax)
        ("full_cf_candargmax",   True,  True,  "1"),   # = the 18:45 rows
        ("full_nhwc_candargmax", False, True,  "1"),   # isolates the feed
        ("full_cf_allargmax",    True,  True,  "0"),   # isolates the argmax
        ("fwd_cf",               True,  False, "1"),
        ("fwd_nhwc",             False, False, "1"),
    ]
    for bs, ns in ((1, (50, 250)), (32, (10, 50))):
        for label, cf, post, gate in cells:
            os.environ["ACHELOUS_NMS_CAND_ARGMAX"] = gate
            t = device_time_per_iter(make_step(post), inputs(bs, cf),
                                     n1=ns[0], n2=ns[1], repeats=3)
            row = {"cell": label, "bs": bs, "s_per_batch": round(t, 6),
                   "fps": round(bs / t, 1)}
            print(json.dumps(row), flush=True)
            results.append(row)

    with open("/tmp/DIAG_CF_REGRESS.json", "w") as f:
        json.dump(results, f, indent=2)
    print("done")


if __name__ == "__main__":
    main()
