"""Does block_until_ready actually wait for device completion on the axon
tunnel?  tools/flops_calibrate.py measured an 8192^3 bf16 matmul at 20 us
(56 PFLOP/s implied — 285x the chip's spec), so either the tunnel's
block_until_ready returns at enqueue, or execution is deferred until a
fetch.  This probe forces completion with ONE device->host fetch at the end
of an N-long dependency chain of matmuls (the D2H hazard degrades later
dispatches, so it runs last) and compares:

  enqueue_s   timed loop + block_until_ready   (the old convention)
  complete_s  same chain timed start -> fetch of a scalar reduction

Slope over two chain lengths separates per-matmul time from fetch overhead.
A real 8192^3 bf16 matmul at the v5e's 197 TFLOP/s spec is 5.58 ms.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain(n, x, b):
    y = x
    for _ in range(n):
        y = y @ b
    return jnp.sum(y[:8, :8])


def main():
    k = 8192
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(k, k), jnp.bfloat16)
    bmat = jnp.asarray(rng.rand(k, k) / k, jnp.bfloat16)  # keep values O(1)

    out = {"device": str(jax.devices()[0]), "k": k,
           "spec_s_per_matmul": round(2.0 * k**3 / 197e12, 5)}

    f10 = jax.jit(lambda x, b: chain(10, x, b))
    f40 = jax.jit(lambda x, b: chain(40, x, b))
    # compile both before any timing
    jax.block_until_ready(f10(x, bmat))
    jax.block_until_ready(f40(x, bmat))

    t0 = time.perf_counter()
    r = f40(x, bmat)
    jax.block_until_ready(r)
    out["enqueue40_s"] = round(time.perf_counter() - t0, 5)

    t0 = time.perf_counter()
    v10 = float(f10(x, bmat))            # fetch forces completion
    out["complete10_s"] = round(time.perf_counter() - t0, 5)

    t0 = time.perf_counter()
    v40 = float(f40(x, bmat))
    out["complete40_s"] = round(time.perf_counter() - t0, 5)

    per = (out["complete40_s"] - out["complete10_s"]) / 30.0
    out["per_matmul_s"] = round(per, 5)
    out["achieved_tflops"] = round(2.0 * k**3 / per / 1e12, 1)
    out["values"] = [v10, v40]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
