"""A/B the small-channel FMA conv paths (ops/smallconv.py) on the full
flagship inference graph.

Measures the EN-GDF-PN-S0 fwd+decode+NMS step (the exact bench.py /
tools/bench_sweep.py program) at bs=1 and bs=32 with the unrolled-FMA
reformulation on vs off, via fetch-forced device-time slopes
(utils/profiling.device_time_per_iter — wall-clock loops measure the axon
tunnel's enqueue rate, not execution).

The FMA gates read env at TRACE time, so each arm must run in its own
process:
  ACHELOUS_SMALLCONV_FMA=0 python tools/cfconv_ab.py --tag off
  ACHELOUS_SMALLCONV_FMA=1 python tools/cfconv_ab.py --tag on
Results are upserted into CFCONV_AB.json keyed by (tag, bs).
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="EN-GDF-PN-S0")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default="CFCONV_AB.json")
    ap.add_argument("--bs", default="1,32")
    args = ap.parse_args(argv)

    from achelous_tpu.ops.postprocess import decode_outputs, non_max_suppression
    from achelous_tpu.utils.profiling import _tiny_scalar, device_time_per_iter
    from tools.bench_sweep import make_model_and_inputs

    model, cfg, inputs = make_model_and_inputs(args.config)
    r = cfg.resolution
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs(1))

    def infer_step(carry):
        img, rad, pc = carry
        det, sem, lane, pcseg = model.apply(variables, img, rad, pc)
        decoded = decode_outputs(det, (r, r))
        nms = non_max_suppression(decoded, cfg.num_det, 0.35, 0.35)
        s = _tiny_scalar((nms, sem, lane, pcseg)) * jnp.float32(1e-12)
        return (img + s.astype(img.dtype), rad + s.astype(rad.dtype),
                pc + s.astype(pc.dtype))

    row = {"tag": args.tag, "config": args.config,
           "fma_env": os.environ.get("ACHELOUS_SMALLCONV_FMA", "<unset>"),
           "max_cin": os.environ.get("ACHELOUS_SMALLCONV_FMA_MAX_CIN", "16"),
           "max_dw": os.environ.get("ACHELOUS_SMALLCONV_FMA_MAX_DW", "32")}
    for bs in [int(b) for b in args.bs.split(",")]:
        ns = (50, 250) if bs == 1 else (10, 50)
        t = device_time_per_iter(infer_step, inputs(bs), n1=ns[0], n2=ns[1],
                                 repeats=3)
        row[f"bs{bs}_s_per_batch"] = round(t, 6)
        row[f"bs{bs}_fps"] = round(bs / t, 1)
        print(json.dumps({f"bs{bs}": row[f"bs{bs}_fps"]}))

    data = {"rows": []}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    data["rows"] = [x for x in data["rows"]
                    if not (x["tag"] == args.tag
                            and x["config"] == args.config)] + [row]
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2)
    os.replace(tmp, args.out)
    print("wrote", args.out, json.dumps(row))


if __name__ == "__main__":
    main()
