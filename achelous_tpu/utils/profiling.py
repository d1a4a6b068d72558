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


def fps(fn: Callable, *args, iters: int = 100, warmup: int = 5,
        repeats: int = 5) -> float:
    """Wall-clock FPS (reference nets/Achelous.py:111-116): the median of
    `repeats` timed loops of `iters` dispatches each.

    WARNING — on the axon tunnel this measures the ENQUEUE rate, not device
    execution: block_until_ready there returns when the dispatch is queued
    (measured 2026-08-17: 40 chained 8192^3 bf16 matmuls "ready" in 0.13 ms
    = 56 PFLOP/s implied, but 250 ms when completion is forced by a fetch =
    89% of the chip's 197 TFLOP/s spec).  Use `device_time_per_iter` for
    true device throughput; this loop remains as the reference-convention
    dispatch-rate probe (valid on direct PJRT backends where
    block_until_ready does wait)."""
    import statistics
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    reps = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        reps.append(iters / (time.perf_counter() - t0))
    return statistics.median(reps)


def _tiny_scalar(tree: Any) -> jnp.ndarray:
    """One fp32 scalar depending on EVERY ELEMENT of every leaf.

    A full reduction per leaf, not a first-element slice: XLA sinks slices
    through elementwise/broadcast/reshape chains, so a carry that depends
    only on ``ravel(leaf)[:1]`` lets the compiler prune the sliceable tail
    of the timed program (upsample decoders, sigmoid/score chains) that the
    separately-jitted FLOPs program still counts — inflating implied MFU.
    Full sums keep every output element live at op granularity; the added
    reductions are HBM-bound reads of tensors the program already
    materialized (≤ a few MB, ~µs) and bias the timing conservatively."""
    s = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.bool_):
            leaf = leaf.astype(jnp.float32)
        s = s + jnp.sum(leaf.astype(jnp.float32))
    return s


def device_time_per_iter(step: Callable[[Any], Any], carry: Any,
                         n1: int = 50, n2: int = 250,
                         repeats: int = 3) -> float:
    """TRUE device seconds per iteration of ``step`` (a carry -> carry
    function with a data dependency between iterations).

    Why not a timed dispatch loop: on the axon tunnel block_until_ready
    returns at ENQUEUE (see `fps`), so wall-clock loops measure the
    dispatch rate — round-2's 43k fps at bs=32 was an enqueue artifact
    (the implied 296 TFLOP/s exceeds the chip's 197 peak).  Completion can
    only be observed via a device->host fetch, but the first fetch pays a
    one-time multi-second sync and every LATER dispatch in the process
    degrades to a constant ~1-1.7 s (CLAUDE.md known backend bugs).

    Recipe that survives all of that: chain ``step`` n times inside ONE
    jitted lax.fori_loop, force completion by fetching a scalar, and take
    the SLOPE between two chain lengths — the fetch cost and the degraded-
    dispatch constant cancel in the difference.  Median over ``repeats``
    slope pairs.  Works unchanged on direct PJRT backends.
    """
    import statistics

    def chained(n):
        def run(c):
            c = jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c)
            return _tiny_scalar(c)
        return jax.jit(run)

    f1, f2 = chained(n1), chained(n2)
    jax.block_until_ready(f1(carry))            # compile (enqueue-cheap)
    jax.block_until_ready(f2(carry))
    float(f1(carry))                            # one-time sync penalty
    slopes = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        float(f1(carry))
        t_1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f2(carry))
        t_2 = time.perf_counter() - t0
        slopes.append((t_2 - t_1) / (n2 - n1))
    return statistics.median(slopes)


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
