"""Unrolled small-channel FMA convs (ops/smallconv.py) == lax convolutions.

The FMA reformulation is a pure compute-path change (same params, same
math up to f32 summation order — the 2e-5 contract of test_rcnet_cf.py),
gated by ACHELOUS_SMALLCONV_FMA / *_MAX_CIN / *_MAX_DW read at trace time.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from achelous_tpu.ops.smallconv import (cf_fma_ok, conv_cf_fma, dw_fma_ok,
                                        dwconv_nhwc_fma)


@pytest.mark.parametrize("cin,cout,k,s,p", [
    (3, 3, 1, 1, 0),     # RCNet block-0 weight_conv1
    (3, 8, 3, 2, 1),     # block-0 weight_conv2 (down)
    (8, 8, 1, 1, 0),     # block-1 weight_conv1
    (8, 12, 3, 2, 1),    # block-3 weight_conv2 (down)
    (3, 18, 3, 1, 1),    # offset conv (unfused CF path)
    (8, 9, 3, 1, 1),     # modulator conv
])
def test_conv_cf_fma_matches_lax(cin, cout, k, s, p):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, cin, 17, 19), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32)
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    got = conv_cf_fma(x, w, b, s, p, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (s, s), [(p, p), (p, p)],
        dimension_numbers=("NCHW", "HWIO", "NCHW")) + b[:, None, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("c,m,k", [(8, 1, 3), (16, 1, 3), (3, 2, 3),
                                   (1, 1, 3), (5, 3, 5)])
def test_dwconv_nhwc_fma_matches_grouped_lax(c, m, k):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 13, 11, c), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, 1, c * m), jnp.float32)
    got = dwconv_nhwc_fma(x, w, None, jnp.float32)
    p = k // 2
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gates_read_env(monkeypatch):
    monkeypatch.setenv("ACHELOUS_SMALLCONV_FMA", "0")
    assert not cf_fma_ok(3) and not dw_fma_ok(8)
    monkeypatch.setenv("ACHELOUS_SMALLCONV_FMA", "1")
    assert cf_fma_ok(16) and not cf_fma_ok(17)
    assert dw_fma_ok(32) and not dw_fma_ok(33)
    monkeypatch.setenv("ACHELOUS_SMALLCONV_FMA_MAX_CIN", "4")
    assert cf_fma_ok(4) and not cf_fma_ok(5)


def test_depthwise_module_tree_and_fallback_equality(monkeypatch):
    """DepthwiseConvFMA must be a drop-in for the nn.Conv it replaced in
    GhostModule: identical param path/shape/init values, and the env-off
    fallback must equal the FMA path to float-order tolerance."""
    import flax.linen as nn

    from achelous_tpu.ops.primitives import DepthwiseConvFMA

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 9, 8), jnp.float32)
    mod = DepthwiseConvFMA(8, ksize=3, name=None)
    ref = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)],
                  feature_group_count=8, use_bias=False)
    v_new = mod.init(jax.random.PRNGKey(7), x)
    v_ref = ref.init(jax.random.PRNGKey(7), x)
    k_new = v_new["params"]["kernel"]
    k_ref = v_ref["params"]["kernel"]
    assert k_new.shape == k_ref.shape
    np.testing.assert_array_equal(np.asarray(k_new), np.asarray(k_ref))

    want_conv = ref.apply(v_ref, x)
    monkeypatch.setenv("ACHELOUS_SMALLCONV_FMA", "1")
    got_fma = mod.apply(v_new, x)
    monkeypatch.setenv("ACHELOUS_SMALLCONV_FMA", "0")
    got_lax = mod.apply(v_new, x)
    np.testing.assert_allclose(np.asarray(got_fma), np.asarray(want_conv),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_lax), np.asarray(want_conv),
                               rtol=2e-5, atol=2e-5)


def test_conv_cf_fma_gradients_match(monkeypatch):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 3, 12, 12), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 8), jnp.float32)
    b = jnp.asarray(rng.randn(8), jnp.float32)

    def loss_fma(w):
        return jnp.sum(conv_cf_fma(x, w, b, 2, 1, jnp.float32) ** 2)

    def loss_lax(w):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "HWIO", "NCHW")) + b[:, None, None]
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_fma)(w)
    g2 = jax.grad(loss_lax)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_ghostmodule_fma_equals_conv_path(monkeypatch):
    """GhostModule end-to-end: FMA cheap_conv == grouped-conv cheap_conv
    on the same params (the seg-decoder production shape, C small)."""
    from achelous_tpu.ops.primitives import GhostModule
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 16, 16, 32), jnp.float32)
    mod = GhostModule(16)
    v = mod.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("ACHELOUS_SMALLCONV_FMA", "1")
    got = mod.apply(v, x)
    monkeypatch.setenv("ACHELOUS_SMALLCONV_FMA", "0")
    want = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
