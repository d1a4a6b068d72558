"""Pallas banded-deform kernel vs the XLA banded path (interpret mode on
CPU; tools/tpu_kernel_check.py re-asserts equality on the real chip).

The kernel is the production-default sampler on TPU
(ops/deform.py deform_conv2d use_pallas auto); its adaptive tiers must be
exact — zero terms of the hat window are fp no-ops, so every tier equals
the full-band formulation wherever it is selected.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from achelous_tpu.ops.deform import banded_deform_samples
from achelous_tpu.ops.pallas_deform import pallas_deform_samples

BAND = 4


def _case(rng, b=2, h=13, w=17, c=3, off_scale=2.5):
    x = rng.randn(b, h, w, c).astype(np.float32)
    off = (rng.rand(b, h, w, 18).astype(np.float32) * 2 - 1) * off_scale
    mask = rng.rand(b, h, w, 9).astype(np.float32) * 2
    return jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask)


@pytest.mark.parametrize("scale", [0.0, 0.7, 1.8, 3.0, 9.0])
def test_pallas_matches_xla_banded(scale):
    """Every adaptive tier (zero / |o|<=1 / |o|<=2 / full band, plus
    out-of-band clipping at 9.0) matches the XLA banded formulation."""
    x, off, mask = _case(np.random.RandomState(int(scale * 10)),
                         off_scale=scale)
    want = banded_deform_samples(x, off, mask, BAND, 3, 3, 1)
    got = pallas_deform_samples(x, off, mask, BAND, 3, 3, 1,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    if scale == 0.0:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_multi_row_tile():
    """h large enough to split into several 8-aligned row tiles."""
    x, off, mask = _case(np.random.RandomState(7), b=1, h=64, w=32,
                         off_scale=3.0)
    want = banded_deform_samples(x, off, mask, BAND, 3, 3, 1)
    got = pallas_deform_samples(x, off, mask, BAND, 3, 3, 1,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_gradients_match_xla():
    """custom_vjp backward (the XLA banded pullback) agrees with
    differentiating the XLA path directly."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    off = jnp.asarray((rng.rand(1, 8, 8, 18) * 2 - 1) * 1.3 + 0.127,
                      jnp.float32)
    mask = jnp.asarray(rng.rand(1, 8, 8, 9), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.sum(
        banded_deform_samples(*a, BAND, 3, 3, 1) ** 2),
        argnums=(0, 1, 2))(x, off, mask)
    g2 = jax.grad(lambda *a: jnp.sum(
        pallas_deform_samples(*a, BAND, 3, 3, 1, True) ** 2),
        argnums=(0, 1, 2))(x, off, mask)
    for a, b, name in zip(g1, g2, "x offset mask".split()):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("mag", [1.0, 2.0, float(BAND)])
def test_pallas_tier_boundary_offsets(mag):
    """max|offset| exactly AT a tier edge (1 / 2 / band): the tier condition
    is inclusive (mo <= r_eff) and the dropped d = r_eff+1 window edge has
    weight exactly zero there — kernel must equal the XLA banded path."""
    rng = np.random.RandomState(int(mag))
    x, _, mask = _case(rng)
    b, h, w, _ = x.shape
    choices = np.array([0.0, mag, -mag], dtype=np.float32)
    off = jnp.asarray(choices[rng.randint(0, 3, size=(b, h, w, 18))])
    want = banded_deform_samples(x, off, mask, BAND, 3, 3)
    got = pallas_deform_samples(x, off, mask, BAND, 3, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
