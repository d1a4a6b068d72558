"""CF-chained RCNet (channels-first TPU layout) == NHWC path.

The production TPU path runs the whole radar encoder channels-first
(models/rcnet.py RCNet cf auto): same params, same math, only the layout
of intermediates changes.  Equality to the NHWC reference path (which
carries torch parity, tests/test_torch_parity.py) is the contract.
"""
import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.core.kernels import pallas_interpret
from achelous_tpu.models.rcnet import RCNet


def _randomized_variables(model, x, seed=3):
    """init + randomize the zero-init offset/modulator convs so the
    deform sampling is exercised off the zero-offset tier."""
    variables = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.RandomState(seed)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape) * 0.1, a.dtype),
        variables["params"])
    return {"params": params, "batch_stats": variables["batch_stats"]}


def test_cf_param_tree_identical():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v_cf = RCNet(phi="S0", band=4, cf=True).init(jax.random.PRNGKey(0), x)
    v_nh = RCNet(phi="S0", band=4, cf=False).init(jax.random.PRNGKey(0), x)
    paths_cf = jax.tree_util.tree_structure(v_cf)
    paths_nh = jax.tree_util.tree_structure(v_nh)
    assert paths_cf == paths_nh
    for a, b in zip(jax.tree_util.tree_leaves(v_cf),
                    jax.tree_util.tree_leaves(v_nh)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cf_eval_equals_nhwc():
    """Covers both the fused blocks (cin<=8) and the unfused-CF blocks
    (cin 12/24) at 64^2 input."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    model_nh = RCNet(phi="S0", band=4, cf=False)
    variables = _randomized_variables(model_nh, x)
    want = model_nh.apply(variables, x)
    with pallas_interpret():
        got = RCNet(phi="S0", band=4).apply(variables, x)  # cf auto -> True
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_in_cf_radar_input_equals_nhwc_input():
    """A channels-first radar map (the on-device splat's native layout,
    ops/radar_splat.py cf=True) must produce identical outputs through both
    the CF-chained path (entry transpose skipped) and the forced-NHWC path
    (entry CF->NHWC transpose inserted)."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    model_nh = RCNet(phi="S0", band=4, cf=False)
    variables = _randomized_variables(model_nh, x)
    want = model_nh.apply(variables, x)
    got_nh = model_nh.apply(variables, x_cf, in_cf=True)
    with pallas_interpret():
        got_cf = RCNet(phi="S0", band=4).apply(variables, x_cf, in_cf=True)
    for g, w in zip(got_nh, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    for g, w in zip(got_cf, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_achelous_accepts_cf_radar():
    """Full-assembly layout autodetection (models/achelous.py radar_cf):
    feeding the radar map [B,3,R,R] equals feeding [B,R,R,3]."""
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", pc_model="pn",
                         resolution=32, dtype=jnp.float32)
    model = create_model(cfg)
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    rad = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    pc = jnp.asarray(rng.rand(1, cfg.pc_points, cfg.pc_channels), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, rad, pc)
    want = model.apply(variables, img, rad, pc)
    got = model.apply(variables, img, jnp.transpose(rad, (0, 3, 1, 2)), pc)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_cf_above_fuse_batch_cap_equals_nhwc():
    """bs=4 > ACHELOUS_DEFORM_FUSE_MAX_BATCH (2): every block — including
    the cin<=8 fuse-eligible ones — must route through the unfused CF
    path and still match NHWC."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    model_nh = RCNet(phi="S0", band=4, cf=False)
    variables = _randomized_variables(model_nh, x)
    want = model_nh.apply(variables, x)
    with pallas_interpret():
        got = RCNet(phi="S0", band=4).apply(variables, x)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_cf_train_mode_and_batch_stats():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    model_nh = RCNet(phi="S0", band=4, cf=False)
    variables = _randomized_variables(model_nh, x)
    want, wstats = model_nh.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    with pallas_interpret():
        got, gstats = RCNet(phi="S0", band=4).apply(
            variables, x, train=True, mutable=["batch_stats"])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)
    for g, w in zip(jax.tree_util.tree_leaves(gstats),
                    jax.tree_util.tree_leaves(wstats)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_jit_grad_traces_through_chained_blocks():
    """Regression: jitted gradients must TRACE through >=2 chained RCNet
    blocks (2026-08-19).  avg_pool_same_cf's reduce_window init used to be
    `jnp.zeros(())`, which inside an autodiff trace is not concrete ->
    lax.reduce_window missed its monoid fast path and bound the generic
    reduce_window_p (no linearize rule) -> every JITTED train step died
    with 'Linearization failed to produce known values for all output
    primals' from the second block on (the first block's pool input is a
    leaf, so single-block tests and eager grads passed).  `.lower()` is the
    assertion — the bug was a trace-time error."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    model = RCNet(phi="S0", band=4, dtype=jnp.float32)
    with pallas_interpret():
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss(p):
            outs = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]}, x)
            return sum(o.astype(jnp.float32).sum() for o in outs)

        jax.jit(jax.grad(loss)).lower(variables["params"])


def test_cf_gradients_match_nhwc():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    model_nh = RCNet(phi="S0", band=4, cf=False)
    variables = _randomized_variables(model_nh, x)

    def loss(params, model):
        outs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x)
        return sum(jnp.sum(o ** 2) for o in outs)

    g_nh = jax.grad(loss)(variables["params"], model_nh)
    with pallas_interpret():
        g_cf = jax.grad(loss)(variables["params"], RCNet(phi="S0", band=4))
    flat_nh = jax.tree_util.tree_leaves_with_path(g_nh)
    flat_cf = dict(jax.tree_util.tree_leaves_with_path(g_cf))
    for path, a in flat_nh:
        b = flat_cf[path]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))
