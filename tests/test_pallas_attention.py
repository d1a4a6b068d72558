"""Pallas fused attention kernel vs the XLA composition (interpret mode on
the CPU test platform)."""
import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.ops.pallas_attention import (fused_bias_attention,
                                               reference_bias_attention)


def test_fused_attention_matches_reference():
    rng = np.random.RandomState(0)
    b, h, n, dk, dv = 2, 8, 100, 32, 128
    q = jnp.asarray(rng.randn(b, h, n, dk), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, n, dk), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, n, dv), jnp.float32)
    bias = jnp.asarray(rng.randn(h, n, n) * 0.1, jnp.float32)
    th1w = jnp.asarray(rng.randn(h, h) * 0.3, jnp.float32)
    th2w = jnp.asarray(rng.randn(h, h) * 0.3, jnp.float32)
    th1b = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    th2b = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    scale = dk ** -0.5
    want = reference_bias_attention(q, k, v, bias, th1w, th1b, th2w, th2b,
                                    scale)
    got = fused_bias_attention(q, k, v, bias, th1w, th1b, th2w, th2b, scale,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)
