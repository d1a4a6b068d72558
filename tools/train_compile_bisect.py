"""Bisect WHY the bs=32/16 train step fails to compile on this rig.

Observed (BENCH_SWEEP runs, 2026-08-18/19): the remote-compile helper
returns HTTP 500 "tpu_compile_helper subprocess exit code 1" for the
flagship train step at bs=32 and bs=16, while bs=8 compiles and runs, and
INFERENCE at bs=32 compiles and runs.  Candidate causes: (a) real HBM
pressure reported badly, (b) the helper subprocess hitting its own
resource/size limit on the larger-shape train graph, (c) a Mosaic/Pallas
interaction at large batch in the backward.

Cells (each in this one process; compile failures are caught per cell):
  infer_bs128          forward at bs=128 — MORE activation bytes than
                       train bs=32; isolates raw activation HBM
  train_bs32_nopallas  train bs=32 with ACHELOUS_NO_PALLAS=1 — drops every
                       Mosaic kernel (fwd and custom_vjp bwd) from the graph
  train_bs32_res160    train bs=32 at 160^2 — same op count, quarter the
                       pixels; isolates shape scaling from graph complexity
  train_bs16_again     reproduce the failure in this process for provenance
  train_bs32_again     ditto at 32

Writes TRAIN_COMPILE_BISECT.json.  Compile-only (jit(...).lower().compile())
— no execution, so cells don't disturb each other.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _trunc_err(e: Exception) -> str:
    return f"{type(e).__name__}: " + \
        " / ".join(str(e).splitlines()[:2])[:300]


def main(argv=None):
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.core.kernels import no_pallas
    from achelous_tpu.data.synthetic import synthetic_batch
    from achelous_tpu.models.achelous import create_model, example_inputs
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state,
                                                make_train_step)
    import contextlib

    out = {"device": str(jax.devices()[0]), "cells": {}}

    def try_cell(name, fn):
        try:
            fn()
            out["cells"][name] = {"ok": True}
        except Exception as e:                          # noqa: BLE001
            out["cells"][name] = {"ok": False, "error": _trunc_err(e)}
        print(name, "->", json.dumps(out["cells"][name]), flush=True)

    def compile_train(bs, resolution=320, pallas=True):
        cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf",
                             pc_model="pn", resolution=resolution,
                             dtype=jnp.bfloat16)
        model = create_model(cfg)
        tcfg = TrainConfig(batch_size=bs)
        scope = contextlib.nullcontext() if pallas else no_pallas()
        with scope:
            state = create_train_state(model, cfg, tcfg,
                                       jax.random.PRNGKey(0),
                                       example_inputs(cfg, batch=2))
            step = make_train_step(model, cfg, tcfg)
            batch = {k: jnp.asarray(v) for k, v in
                     synthetic_batch(cfg, bs, tcfg.max_gt).items()}
            jax.jit(step).lower(state, batch,
                                jnp.float32(1e-3)).compile()

    def compile_infer(bs, resolution=320):
        cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf",
                             pc_model="pn", resolution=resolution,
                             dtype=jnp.bfloat16)
        model = create_model(cfg)
        img, rad, pc = example_inputs(cfg, batch=bs)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        *example_inputs(cfg, batch=2))
        jax.jit(lambda v, *a: model.apply(v, *a)).lower(
            variables, img, rad, pc).compile()

    try_cell("infer_bs128", lambda: compile_infer(128))
    try_cell("train_bs32_nopallas", lambda: compile_train(32, pallas=False))
    try_cell("train_bs32_res160", lambda: compile_train(32, resolution=160))
    try_cell("train_bs16_again", lambda: compile_train(16))
    try_cell("train_bs32_again", lambda: compile_train(32))

    line = json.dumps(out)
    print(line)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "TRAIN_COMPILE_BISECT.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
