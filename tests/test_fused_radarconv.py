"""Fused RadarConv Pallas kernel (pool + offset/modulator convs + banded
sampling + projection) vs its XLA composition, interpret mode on CPU;
tools/tpu_kernel_check.py re-asserts equality on the real chip.

The fused kernel is the production RCNet path on TPU (ops/deform.py
DeformableConv2d input_pool=True): it must match
`fused_radarconv_reference`, which is itself built from the already-golden
pieces (avg_pool_same / conv_same / banded_deform_samples) that carry
torchvision parity (tests/test_deform_banded.py, reference
conv_utils/dcn.py:6-64 + RadarEncoder.py:23-41).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from achelous_tpu.ops.deform import fused_radarconv_reference
from achelous_tpu.ops.pallas_deform import pallas_fused_radarconv

BAND = 4


def _case(rng, b=2, h=16, w=24, c=3, cout=3, off_w=0.0, off_b=0.0):
    """Random input + conv params; off_w/off_b scale the offset conv so the
    produced offsets exercise a chosen adaptive tier."""
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    ok = jnp.asarray(rng.randn(3, 3, c, 18) * off_w, jnp.float32)
    ob = jnp.asarray(rng.randn(18) * off_b, jnp.float32)
    mk = jnp.asarray(rng.randn(3, 3, c, 9) * 0.3, jnp.float32)
    mb = jnp.asarray(rng.randn(9) * 0.3, jnp.float32)
    wp = jnp.asarray(rng.randn(3, 3, c, cout) * 0.2, jnp.float32)
    return x, ok, ob, mk, mb, wp


@pytest.mark.parametrize("off_w,off_b", [
    (0.0, 0.0),    # tier 0: zero-init offsets (the reference's init regime)
    (0.05, 0.3),   # |o| small -> tier 1
    (0.2, 1.5),    # tier 2
    (0.5, 3.0),    # tier 3 (full band)
    (2.0, 8.0),    # beyond band -> clipped
])
def test_fused_matches_reference(off_w, off_b):
    args = _case(np.random.RandomState(int(off_w * 10 + off_b)),
                 off_w=off_w, off_b=off_b)
    want = fused_radarconv_reference(*args, BAND, 3, 3, 1)
    got = pallas_fused_radarconv(*args, BAND, 3, 3, 1, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_multi_row_tile_and_wider_cin():
    """h large enough for several 16-row tiles; cin=8/cout=8 (RCNet blocks
    1-3) so the in-kernel conv and projection cover the non-trivial
    channel counts."""
    args = _case(np.random.RandomState(11), b=1, h=64, w=32, c=8, cout=8,
                 off_w=0.4, off_b=2.0)
    want = fused_radarconv_reference(*args, BAND, 3, 3, 1)
    got = pallas_fused_radarconv(*args, BAND, 3, 3, 1, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_boundary_zeroing():
    """Offsets pushed far out-of-image must sample exact zeros (trained
    nets drop taps this way, OFFSET_DISTRIBUTION.json): the in-kernel
    pooled halo is zero-masked outside the true image, matching the
    reference composition's pool-then-zero-pad order."""
    rng = np.random.RandomState(5)
    x, ok, ob, mk, mb, wp = _case(rng, b=1, h=16, w=16)
    ob = jnp.asarray(np.repeat([[BAND], [-BAND]], 9, 1).reshape(-1), # all
                     jnp.float32)                   # taps to the band edge
    want = fused_radarconv_reference(x, ok, ob, mk, mb, wp, BAND, 3, 3, 1)
    got = pallas_fused_radarconv(x, ok, ob, mk, mb, wp, BAND, 3, 3, 1, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_reference():
    """custom_vjp backward is the reference composition's pullback —
    gradients through the fused op must equal differentiating the
    reference directly (all six cotangents)."""
    args = _case(np.random.RandomState(3), b=1, h=16, w=16,
                 off_w=0.3, off_b=1.0)

    g1 = jax.grad(lambda *a: jnp.sum(
        fused_radarconv_reference(*a, BAND, 3, 3, 1) ** 2),
        argnums=tuple(range(6)))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(
        pallas_fused_radarconv(*a, BAND, 3, 3, 1, True) ** 2),
        argnums=tuple(range(6)))(*args)
    names = "x ok ob mk mb wproj".split()
    for a, b, name in zip(g1, g2, names):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_module_fused_equals_unfused():
    """DeformableConv2d(input_pool=True) under pallas_interpret() (fused
    kernel) vs use_pallas=False (XLA pool+conv+banded path): same params,
    same function."""
    from achelous_tpu.core.kernels import pallas_interpret
    from achelous_tpu.ops.deform import DeformableConv2d

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    mod = DeformableConv2d(3, band=BAND, input_pool=True)
    variables = mod.init(jax.random.PRNGKey(0), x)
    # randomize the zero-initialized offset/modulator convs
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape) * 0.3, a.dtype),
        variables["params"])
    variables = {"params": p}

    want = DeformableConv2d(3, band=BAND, input_pool=True,
                            use_pallas=False).apply(variables, x)
    with pallas_interpret():
        got = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_param_tree_unchanged():
    """The _ConvParams refactor must keep the exact nn.Conv param paths
    (checkpoint + torch-transplant compatibility)."""
    from achelous_tpu.ops.deform import DeformableConv2d
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    variables = DeformableConv2d(4, band=BAND, input_pool=True).init(
        jax.random.PRNGKey(0), x)
    p = variables["params"]
    assert p["offset_conv"]["kernel"].shape == (3, 3, 3, 18)
    assert p["offset_conv"]["bias"].shape == (18,)
    assert p["modulator_conv"]["kernel"].shape == (3, 3, 3, 9)
    assert p["modulator_conv"]["bias"].shape == (9,)
    assert p["weight"].shape == (3, 3, 3, 4)
    assert float(jnp.abs(p["offset_conv"]["kernel"]).sum()) == 0.0
