"""Calibrate XLA cost-analysis FLOPs and the achievable bf16 peak on this
chip with ops of KNOWN algorithmic cost (2*M*N*K matmul, 2*B*H*W*K*K*Ci*Co
conv).  Pins whether utils/profiling.flops_of overcounts and what fraction
of the v5e's 197 TFLOP/s spec a dense op actually reaches through this
runtime — the denominator question behind ARCHITECTURE.md's MFU claim.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.utils.profiling import flops_of


def median_time(f, args, iters=30, repeats=5, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    reps = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        reps.append((time.perf_counter() - t0) / iters)
    reps.sort()
    return reps[len(reps) // 2]


def main():
    rng = np.random.RandomState(0)
    out = {"device": str(jax.devices()[0])}

    # --- big bf16 matmul: algorithmic 2*M*N*K ---
    m = n = k = 8192
    a = jnp.asarray(rng.rand(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.rand(k, n), jnp.bfloat16)

    def mm(a, b):
        return a @ b

    alg = 2.0 * m * n * k
    ca = flops_of(mm, a, b)
    t = median_time(jax.jit(mm), (a, b))
    out["matmul"] = {"alg_flops": alg, "cost_analysis_flops": ca,
                     "ratio_ca_over_alg": round(ca / alg, 4),
                     "time_s": round(t, 6),
                     "achieved_tflops_alg": round(alg / t / 1e12, 2)}

    # --- 3x3 conv, NHWC bf16: algorithmic 2*B*H*W*KK*Ci*Co ---
    bch, h, w, ci, co = 32, 160, 160, 128, 128
    x = jnp.asarray(rng.rand(bch, h, w, ci), jnp.bfloat16)
    wgt = jnp.asarray(rng.rand(3, 3, ci, co), jnp.bfloat16)

    def conv(x, wgt):
        return jax.lax.conv_general_dilated(
            x, wgt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    algc = 2.0 * bch * h * w * 9 * ci * co
    cac = flops_of(conv, x, wgt)
    tc = median_time(jax.jit(conv), (x, wgt))
    out["conv3x3"] = {"alg_flops": algc, "cost_analysis_flops": cac,
                      "ratio_ca_over_alg": round(cac / algc, 4),
                      "time_s": round(tc, 6),
                      "achieved_tflops_alg": round(algc / tc / 1e12, 2)}

    # --- small conv the size the model actually runs (dispatch floor) ---
    xs = jnp.asarray(rng.rand(32, 40, 40, 64), jnp.bfloat16)
    ws = jnp.asarray(rng.rand(3, 3, 64, 64), jnp.bfloat16)
    ts = median_time(jax.jit(conv), (xs, ws))
    out["conv_small"] = {
        "alg_flops": 2.0 * 32 * 40 * 40 * 9 * 64 * 64,
        "time_s": round(ts, 6),
        "achieved_tflops_alg": round(2.0 * 32 * 40 * 40 * 9 * 64 * 64
                                     / ts / 1e12, 2)}

    # --- dispatch floor: trivial program ---
    def triv(x):
        return x + 1.0

    tt = median_time(jax.jit(triv), (jnp.float32(1.0),))
    out["dispatch_floor_s"] = round(tt, 6)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
