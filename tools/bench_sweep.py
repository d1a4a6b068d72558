"""Reproducible benchmark sweep backing ARCHITECTURE.md's performance table.

Sweeps the BASELINE.md headline configs x batch size over
  * 5-task inference (fwd + decode + NMS, bf16) — the reference FPS
    convention (nets/Achelous.py:111-116, README.md:115-116), and
  * the full jitted train step (SimOTA + 4-task losses + SGD + EMA),
and writes one JSON document (default: BENCH_SWEEP.json at the repo root —
committed once per round so the perf claims are reproducible artifacts,
VERDICT r1 item 9).

All numbers are TRUE device throughput (fetch-forced fori_loop slope,
utils/profiling.device_time_per_iter) — NOT comparable to the r1/r2
sweeps, which unknowingly measured the axon tunnel's dispatch-enqueue
rate (block_until_ready there returns at enqueue; see bench.py).

Usage:
  python tools/bench_sweep.py [--out BENCH_SWEEP.json] [--configs EN-GDF-PN-S0,...]
         [--iters 100] [--skip-train] [--train-only]

--train-only merges fresh train_* fields into existing rows without
re-measuring inference: the r5 sweep's train cells all failed because the
sweep process had imported the pre-fix avg_pool_same_cf (the reduce_window
init-value linearization bug, TRAIN_COMPILE_BISECT.json), and redoing the
~20-min-per-config infer slopes just to land train numbers would waste a
hardware window.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# (name, reference RTX A4000 fps from README.md:80-94; None = not published)
DEFAULT_CONFIGS = [
    ("EN-GDF-PN-S0", 61.3),    # README.md:81 — the flagship
    ("EN-GDF-PN-S1", 59.7),    # README.md:87 — named by the north-star
    ("EN-GDF-PN-S2", 58.1),    # README.md:91 — named by the north-star
    ("EN-GDF-PN2-S0", 57.7),   # README.md:83
    ("MV-GDF-PN-S1", 55.8),    # README.md:90
    ("EN-CDF-PN2-S2", None),   # best pc-mIoU family at S2 (README.md:101)
]


def parse_name(name: str):
    backbone, neck, pc, phi = name.split("-")
    return dict(backbone=backbone.lower(), neck=neck.lower(),
                pc_model=pc.lower(), phi=phi)


def _git_stamp() -> dict:
    import datetime
    import subprocess
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(__file__)).stdout.strip()
    except OSError:
        rev = None
    return {"git_rev": rev or "unknown",
            "date": datetime.date.today().isoformat()}


DEFAULT_TRAIN_RUNGS = ((32, 1), (32, 2), (32, 4), (16, 1), (16, 2),
                       (8, 1), (4, 1))


def measure_train(model, cfg, inputs, rungs=DEFAULT_TRAIN_RUNGS) -> dict:
    """Train-step throughput at the largest batch the rig admits, starting
    from the reference's bs=32 (/root/reference/train.py:151,159).

    Ladder: bs=32 monolithic, then bs=32 with grad accumulation (2 then 4
    micro-batches — an N-times-smaller XLA program, the workaround for the
    compile-helper 500 on the monolithic graph, TRAIN_COMPILE_BISECT.json),
    then halve the batch.  `rungs` overrides the ladder (--train-rungs):
    each FAILED rung costs ~9 min of hardware window (the helper compiles
    for minutes before its subprocess dies), so once the flagship has
    established which rungs the helper admits, the remaining configs
    should start the ladder there."""
    from achelous_tpu.data.synthetic import synthetic_batch
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state,
                                                make_train_step)
    from achelous_tpu.utils.profiling import device_time_per_iter
    out = {}
    for bs, accum in rungs:
        try:
            tcfg = TrainConfig(batch_size=bs, grad_accum=accum)
            state = create_train_state(model, cfg, tcfg,
                                       jax.random.PRNGKey(0), inputs(2))
            raw_step = make_train_step(model, cfg, tcfg)
            batch = {k: jnp.asarray(v) for k, v in
                     synthetic_batch(cfg, bs, tcfg.max_gt).items()}
            lr = jnp.float32(1e-3)

            # The batch rides in the CARRY, not a closure: closed-over
            # arrays are embedded in the HLO as literal constants, and
            # at bs=32 the one-hot seg targets alone are ~130 MB — the
            # remote-compile helper rejects the request with HTTP 413
            # (observed 2026-08-18; this was the r3 "bs=32 train does
            # not compile" mystery, VERDICT r3 next 3).  The optimizer
            # state carries the iteration-to-iteration dependency;
            # batch reuse matches a steady dataloader-fed loop.
            def train_step(carry, raw_step=raw_step, lr=lr):
                st, bt = carry
                return raw_step(st, bt, lr)[0], bt

            t = device_time_per_iter(train_step, (state, batch),
                                     n1=3, n2=12, repeats=3)
            out["train_bs"] = bs
            out["train_grad_accum"] = accum
            out["train_steps_per_s"] = round(1.0 / t, 3)
            out["train_samples_per_s"] = round(bs / t, 1)
            break
        except Exception as e:       # helper 500 / HBM OOM — next rung
            # Keep the first lines of the message: the 2026-08-18
            # window lost the bs=32/16 root cause (helper 500 vs real
            # OOM) because only the type was printed.
            msg = " / ".join(str(e).splitlines()[:3])[:500]
            print(f"train bs={bs} accum={accum} failed "
                  f"({type(e).__name__}: {msg}); next rung", flush=True)
    return out


def make_model_and_inputs(name: str):
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model

    cfg = AchelousConfig(resolution=320, dtype=jnp.bfloat16,
                         **parse_name(name))
    model = create_model(cfg)
    r = cfg.resolution
    rng = np.random.RandomState(0)

    def inputs(bs):
        # radar CF [B,3,R,R]: the production/serving layout (see bench.py —
        # the reference feeds NCHW, predict.py loads the npz untransposed,
        # the on-device splat emits CF), so the CF-chained RCNet starts
        # with no entry relayout.
        return (jnp.asarray(rng.rand(bs, r, r, 3), jnp.bfloat16),
                jnp.asarray(rng.rand(bs, 3, r, r), jnp.bfloat16),
                jnp.asarray(rng.rand(bs, cfg.pc_points, cfg.pc_channels),
                            jnp.bfloat16))
    return model, cfg, inputs


def bench_config(name: str, ref_fps, iters: int, with_train: bool) -> dict:
    from achelous_tpu.ops.postprocess import decode_outputs, non_max_suppression
    from achelous_tpu.utils.profiling import (_tiny_scalar, count_params,
                                              device_time_per_iter, flops_of)

    model, cfg, inputs = make_model_and_inputs(name)
    r = cfg.resolution
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs(1))

    # All timings are TRUE device time via fetch-forced fori_loop slopes
    # (utils/profiling.device_time_per_iter) — wall-clock dispatch loops
    # measure the axon tunnel's ENQUEUE rate, not execution (the r2 sweep's
    # 43k fps at bs=32 implied 296 TFLOP/s on a 197-peak chip).  Every
    # input is perturbed per iteration so no model branch is
    # loop-invariant.
    def infer_step(carry):
        img, rad, pc = carry
        det, sem, lane, pcseg = model.apply(variables, img, rad, pc)
        decoded = decode_outputs(det, (r, r))
        nms = non_max_suppression(decoded, cfg.num_det, 0.35, 0.35)
        s = _tiny_scalar((nms, sem, lane, pcseg)) * jnp.float32(1e-12)
        return (img + s.astype(img.dtype), rad + s.astype(rad.dtype),
                pc + s.astype(pc.dtype))

    # Row provenance: r4's sweep mixed rows measured at different commits
    # (pre-/post-fuse-gate) with no way to tell — every row now says what
    # code produced it (VERDICT r4 weak 1).
    out = {"config": name, "ref_fps_a4000": ref_fps,
           "params": count_params(variables["params"]),
           **_git_stamp(),
           "method": "fetch-forced device time (profiling."
                     "device_time_per_iter)"}

    def full_for_flops(v, image, radar, pc):
        det, sem, lane, pcseg = model.apply(v, image, radar, pc)
        decoded = decode_outputs(det, (r, r))
        return (non_max_suppression(decoded, cfg.num_det, 0.35, 0.35),
                sem, lane, pcseg)

    try:
        out["flops_bs1"] = flops_of(full_for_flops, variables, *inputs(1))
    except Exception:
        out["flops_bs1"] = None

    for bs, ns in ((1, (50, 250)), (32, (10, 50))):
        t = device_time_per_iter(infer_step, inputs(bs), n1=ns[0],
                                 n2=ns[1], repeats=3)
        out[f"infer_bs{bs}_s_per_batch"] = round(t, 6)
        out[f"infer_bs{bs}_fps"] = round(bs / t, 1)
    if ref_fps:
        out["vs_a4000_bs1"] = round(out["infer_bs1_fps"] / ref_fps, 2)

    if with_train:
        out.update(measure_train(model, cfg, inputs))
    return out


def bench_train_only(name: str, rungs=DEFAULT_TRAIN_RUNGS) -> dict:
    """Just the train_* fields plus their own provenance stamp (the infer
    fields keep the rev that measured them)."""
    model, cfg, inputs = make_model_and_inputs(name)
    res = measure_train(model, cfg, inputs, rungs)  # keys train_-prefixed
    if res:
        res.update({"train_" + k: v for k, v in _git_stamp().items()})
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "BENCH_SWEEP.json"))
    ap.add_argument("--configs", default=None,
                    help="comma-separated (default: the 4 BASELINE configs)")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--train-only", action="store_true",
                    help="merge fresh train_* fields into existing rows "
                         "(keeps the infer measurements)")
    ap.add_argument("--train-rungs", default=None,
                    help="comma-separated bs:accum ladder override, e.g. "
                         "'32:4,16:1,8:1' — skip rungs the compile helper "
                         "is known to reject (each failure burns ~9 min)")
    args = ap.parse_args(argv)
    rungs = DEFAULT_TRAIN_RUNGS
    if args.train_rungs:
        rungs = tuple(tuple(int(v) for v in r.split(":"))
                      for r in args.train_rungs.split(","))

    if args.configs:
        ref = dict(DEFAULT_CONFIGS)
        todo = [(c, ref.get(c)) for c in args.configs.split(",")]
    else:
        todo = DEFAULT_CONFIGS

    dev = jax.devices()[0]
    doc = {"device": f"{dev.platform}:{dev.device_kind}",
           "n_devices": jax.device_count(),
           "resolution": 320, "dtype": "bfloat16",
           "results": []}
    # Merge into an existing artifact: partial windows land configs one at
    # a time across runs (the r3 window only finished the flagship), so a
    # re-run with --configs <the rest> must upsert rows rather than clobber
    # the document (ADVICE r3: the chain used to write a side file nothing
    # merged).
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            doc["results"] = [r for r in prev.get("results", [])
                              if isinstance(r, dict) and r.get("config")]
        except (json.JSONDecodeError, OSError):
            pass

    def upsert(res):
        # MERGE into an existing row rather than replace it: infer and train
        # cells are re-measured independently (--skip-train / --train-only)
        # and each carries its own provenance stamp, so a fresh infer run
        # must not wipe the row's train_* fields (and vice versa).
        for r in doc["results"]:
            if r.get("config") == res["config"]:
                r.update(res)
                return
        doc["results"].append(res)

    def write(in_flight: bool):
        # `partial` = this run is mid-flight OR the merged doc still lacks
        # one of the 4 BASELINE configs.  Atomic temp+rename: a SIGTERM
        # mid-dump must not corrupt the artifact (ADVICE r3).
        have = {r.get("config") for r in doc["results"]}
        doc["partial"] = in_flight or not all(
            c in have for c, _ in DEFAULT_CONFIGS)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=2)
            f.write("\n")
        os.replace(tmp, args.out)

    # Write the artifact after EVERY config: remote compiles take minutes
    # per config and the axon backend can drop mid-sweep (multi-hour
    # outages, verify skill "OUTAGES"), so an end-only write risks losing
    # hours of measurement.
    for i, (name, ref_fps) in enumerate(todo):
        print(f"== {name} ==", flush=True)
        if args.train_only:
            fields = bench_train_only(name, rungs)
            print(json.dumps(fields), flush=True)
            fields["config"] = name
            upsert(fields)
        else:
            res = bench_config(name, ref_fps, args.iters,
                               with_train=not args.skip_train)
            print(json.dumps(res), flush=True)
            upsert(res)
        write(in_flight=i + 1 < len(todo))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
