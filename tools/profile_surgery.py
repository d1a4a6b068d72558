"""Profile the MGDA/CAGrad gradient-surgery train step at production scale.

VERDICT r1 weak #10: the surgery path (4 jax.vjp pullbacks + ravel_pytree of
4 full gradient copies + the simplex solve, train/train_state.py) had only
tiny-shape tests.  This tool times the full EN-GDF-PN-S0 train step at
320x320 for mtl in {sum, mgda, cagrad} on the current backend and prints a
JSON summary; results are recorded in ARCHITECTURE.md's performance notes.

Usage: python tools/profile_surgery.py [--bs 8] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.data.synthetic import synthetic_batch
    from achelous_tpu.models.achelous import create_model, example_inputs
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state,
                                                make_train_step)
    from achelous_tpu.utils.profiling import count_params

    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf",
                         resolution=320, dtype=jnp.bfloat16)
    model = create_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, args.bs, 50).items()}
    lr = jnp.float32(1e-3)
    dev = jax.devices()[0]
    out = {"device": f"{dev.platform}:{dev.device_kind}", "bs": args.bs,
           "config": cfg.name, "results": {}}
    final_losses = {}

    for mtl in ("sum", "mgda", "cagrad"):
        tcfg = TrainConfig(batch_size=args.bs, mtl=mtl)
        state = create_train_state(model, cfg, tcfg, jax.random.PRNGKey(0),
                                   example_inputs(cfg, 2))
        if "params_m" not in out:
            out["params_m"] = round(count_params(state.params) / 1e6, 3)
        step = jax.jit(make_train_step(model, cfg, tcfg))
        t_c = time.perf_counter()
        state, m = step(state, batch, lr)
        jax.block_until_ready(m)
        compile_s = time.perf_counter() - t_c
        for _ in range(3):
            state, m = step(state, batch, lr)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step(state, batch, lr)
        jax.block_until_ready(m)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        # NB: no device->host transfer may happen until EVERY timed round is
        # done — on the axon backend a single D2H fetch (device_get, float(),
        # even copy_to_host_async) permanently degrades all subsequent jit
        # dispatch in the process to ~1-1.7 s/call (bisected 2026-08-17, see
        # CLAUDE.md known backend bugs).  Losses are stashed as device
        # arrays and checked after the loop.
        out["results"][mtl] = {"step_ms": round(ms, 2),
                               "compile_s": round(compile_s, 1)}
        final_losses[mtl] = m["loss"]
        print(f"{mtl}: {ms:.2f} ms/step", flush=True)

    for mtl, loss in final_losses.items():   # safe: all timing is done
        out["results"][mtl]["loss_finite"] = bool(
            np.isfinite(jax.device_get(loss)))
    s = out["results"]["sum"]["step_ms"]
    for mtl in ("mgda", "cagrad"):
        out["results"][mtl]["overhead_vs_sum"] = round(
            out["results"][mtl]["step_ms"] / s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
