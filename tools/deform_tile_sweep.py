"""Sweep the Pallas deform kernel's row-tile pixel cap on real hardware.

Why: the tier-0 (zero-offset) RCNet pass measures ~16x above its HBM
traffic bound, implicating per-grid-cell overhead — the default 8k-px cap
gives 640 grid cells per batch element for the 320^2 stage-0 block.  The
cap was sized for the original kernel body's VMEM stack behaviour; the
current body holds fewer live temporaries, so larger tiles may compile
fine and amortize the per-cell cost.

Each cap value runs in a FRESH subprocess (the cap is read per trace via
ACHELOUS_DEFORM_TILE_PX, but a clean process also isolates compile-cache
and Mosaic state), timing RCNet-S0 320^2 forward at bs=1 and bs=32 with
fetch-forced slope timing, zero offsets (the bench regime) AND randomized
small offsets (the trained regime).

Usage: python tools/deform_tile_sweep.py [--caps 8192,16384,32768,102400]
       [--out DEFORM_TILE_SWEEP.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

# NOTE: substituted via .replace (not str.format — the child source is full
# of literal braces that .format would treat as fields)
_CHILD = r"""
import json, os, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, __ROOT__)
from achelous_tpu.models.rcnet import RCNet
from achelous_tpu.utils.profiling import _tiny_scalar, device_time_per_iter
import flax

rng = np.random.RandomState(0)
model = RCNet(phi="S0", band=4, dtype=jnp.bfloat16)
x1 = jnp.asarray(rng.rand(1, 320, 320, 3), jnp.bfloat16)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1)

# randomized-offset variant (trained regime, |offset| mostly <= 1)
flat = flax.traverse_util.flatten_dict(variables["params"])
for path in list(flat):
    if "offset_conv" in path or "modulator_conv" in path:
        flat[path] = jnp.asarray(
            rng.normal(0, 0.05, flat[path].shape).astype(np.float32))
variables_rand = {**variables,
                  "params": flax.traverse_util.unflatten_dict(flat)}

out = {}
for bs, ns in ((1, (50, 250)), (32, (10, 50))):
    x = jnp.asarray(rng.rand(bs, 320, 320, 3), jnp.bfloat16)
    for tag, v in (("zero_off", variables), ("rand_off", variables_rand)):
        def step(carry):
            (xx,) = carry
            res = model.apply(v, xx)
            s = _tiny_scalar(res) * jnp.float32(1e-12)
            return (xx + s.astype(xx.dtype),)
        t = device_time_per_iter(step, (x,), n1=ns[0], n2=ns[1], repeats=3)
        out[f"rcnet_bs{bs}_{tag}_ms"] = round(t * 1e3, 4)
print("CHILD_RESULT " + json.dumps(out))
"""


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="8192,16384,32768,102400")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    results = {}
    for cap in args.caps.split(","):
        cap = cap.strip()
        env = dict(os.environ)
        env["ACHELOUS_DEFORM_TILE_PX"] = cap
        print(f"=== cap {cap} px ===", flush=True)
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD.replace("__ROOT__", repr(root))],
            env=env, capture_output=True, text=True, timeout=7200)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")]
        if proc.returncode != 0 or not line:
            results[cap] = {"error": (proc.stderr or proc.stdout)[-800:]}
            print(f"cap {cap}: FAILED", flush=True)
        else:
            results[cap] = json.loads(line[0][len("CHILD_RESULT "):])
            print(f"cap {cap}: {results[cap]}", flush=True)

    doc = {"device": "see chain log", "sweep": results}
    print(json.dumps(doc))
    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps(doc) + "\n")


if __name__ == "__main__":
    main()
