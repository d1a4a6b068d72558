"""Model profiling: FLOPs, parameter counts, FPS harness.

Replaces the reference's thop profile + clever_format + torchinfo summary +
wall-clock FPS loops (nets/Achelous.py:104-116, SURVEY.md §5): FLOPs come
from XLA's own cost analysis of the compiled program (exact for the program
that actually runs, unlike thop's per-module estimates).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def count_params(tree: Any) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(tree))


def clever_format(n: float) -> str:
    """thop-style human formatting (reference uses '%.3f')."""
    for unit, div in (("T", 1e12), ("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if abs(n) >= div:
            return f"{n / div:.3f}{unit}"
    return f"{n:.3f}"


def flops_of(fn: Callable, *args) -> float:
    """FLOPs of the compiled program via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):       # older jax returns per-device list
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def fps(fn: Callable, *args, iters: int = 100, warmup: int = 5) -> float:
    """Wall-clock FPS loop (reference nets/Achelous.py:111-116)."""
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return iters / (time.perf_counter() - t0)


def summarize_model(model, *example_inputs, train: bool = False) -> Dict:
    """Params + FLOPs + output shapes for a flax model — the torchinfo
    summary equivalent."""
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                                  *example_inputs))()
    n_params = count_params(variables["params"])

    def fwd(v, *a):
        return model.apply(v, *a, train=train)

    out_shapes = jax.tree_util.tree_map(
        lambda x: tuple(x.shape),
        jax.eval_shape(fwd, variables, *example_inputs))
    try:
        fl = flops_of(fwd, variables, *example_inputs)
    except Exception:
        fl = float("nan")
    return {"params": n_params, "params_h": clever_format(n_params),
            "flops": fl, "flops_h": clever_format(fl),
            "output_shapes": out_shapes}
