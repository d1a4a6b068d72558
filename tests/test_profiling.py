"""Measurement-infrastructure guards (utils/profiling).

The perf story rests on fetch-forced fori_loop slope timing
(device_time_per_iter).  Two invariants keep that measurement honest:

  1. the chained program computes EXACTLY what n eager applications of the
     step compute (no hoisting/pruning may change semantics), and
  2. the compiled loop body retains the step program's full FLOPs (XLA's
     cost analysis counts a while-loop body once — so body-flops must
     match one step's flops; if a compiler pass ever starts slicing work
     out of the timed loop, this catches it statically).

Round-3 context: a bs=32 measurement implied 100% of bf16 peak, raising
exactly this suspicion; the CPU check that became invariant 2 disproved
pruning (the artifact lies elsewhere — see ARCHITECTURE.md performance
notes).
"""
import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.utils.profiling import _tiny_scalar, flops_of


def _step(carry):
    """A conv+reduce step shaped like the bench steps: output feeds back
    into the carry only through the tiny scalar."""
    (x, w) = carry
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"))
    y = jnp.tanh(y)
    s = _tiny_scalar((y,)) * jnp.float32(1e-12)
    return (x + s.astype(x.dtype), w + s.astype(w.dtype))


def _inputs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    return (x, w)


def test_chained_loop_equals_eager_iteration():
    n = 7
    carry = _inputs()

    def chained(c):
        c = jax.lax.fori_loop(0, n, lambda i, cc: _step(cc), c)
        return _tiny_scalar(c)

    want = carry
    for _ in range(n):
        want = _step(want)
    np.testing.assert_allclose(float(jax.jit(chained)(carry)),
                               float(_tiny_scalar(want)), rtol=1e-6)


def test_timed_loop_body_retains_full_flops():
    carry = _inputs()
    step_flops = flops_of(_step, carry)

    def chained(c):
        c = jax.lax.fori_loop(0, 50, lambda i, cc: _step(cc), c)
        return _tiny_scalar(c)

    loop_flops = flops_of(chained, carry)
    # cost analysis counts the while body ONCE (verified: identical totals
    # at trip counts 20 and 40), so body-flops ~ one step's flops.  A big
    # deficit means the compiler pruned work out of the timed program.
    assert loop_flops > 0.95 * step_flops, (loop_flops, step_flops)
    # and no runaway either (body should not replicate the step)
    assert loop_flops < 3.0 * step_flops, (loop_flops, step_flops)


def test_tiny_scalar_depends_on_every_leaf():
    a = jnp.ones((4, 4))
    b = jnp.zeros((2, 3), jnp.bool_)
    s0 = float(_tiny_scalar((a, b)))
    s1 = float(_tiny_scalar((a.at[3, 3].add(2.0), b)))
    s2 = float(_tiny_scalar((a, b.at[1, 2].set(True))))
    assert s1 != s0 and s2 != s0
