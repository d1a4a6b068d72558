"""Train-form vs deploy-form equivalence after parameter folding — the
invariant implied by reference repvgg_conv.py:110 and mobileone.py:155
(outputs equal at fp32 tolerance)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from achelous_tpu.core.reparam import reparameterize


def _train_then_eval(block_fn, x, n_train_steps=2):
    """Init a module, run a couple of train steps to make BN stats
    non-trivial, return (variables, eval_output)."""
    train_m = block_fn(deploy=False)
    variables = train_m.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    for i in range(n_train_steps):
        rng = jax.random.PRNGKey(i + 1)
        xb = x + 0.1 * jax.random.normal(rng, x.shape)
        _, upd = train_m.apply({"params": params, "batch_stats": stats}, xb,
                               train=True, mutable=["batch_stats"])
        stats = upd["batch_stats"]
    out = train_m.apply({"params": params, "batch_stats": stats}, x,
                        train=False)
    return {"params": params, "batch_stats": stats}, out


def _check(block_fn, x, atol=2e-5, rtol=1e-4):
    variables, want = _train_then_eval(block_fn, x)
    deploy_vars = reparameterize(variables)
    deploy_m = block_fn(deploy=True)
    # structural check: deploy tree matches the deploy-form module
    ref = jax.eval_shape(functools.partial(deploy_m.init, train=False),
                         jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(ref["params"]) == \
        jax.tree_util.tree_structure(deploy_vars["params"])
    got = deploy_m.apply(deploy_vars, x, train=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=atol, rtol=rtol),
        want, got)


def test_repvgg_block():
    from achelous_tpu.ops.blocks import RepVGGBlock
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 16))
    _check(lambda deploy: RepVGGBlock(16, deploy=deploy), x)
    _check(lambda deploy: RepVGGBlock(24, deploy=deploy), x)  # no identity


@pytest.mark.parametrize("kw", [
    dict(features=16, kernel_size=3, groups=16, num_conv_branches=4),  # dw, S0
    dict(features=24, kernel_size=1),                                  # pw
    dict(features=16, kernel_size=3, stride=2),
    dict(features=16, kernel_size=3, use_act=False),                   # mixer
])
def test_mobileone_block(kw):
    from achelous_tpu.ops.mobileone_block import MobileOneBlock
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16))
    _check(lambda deploy: MobileOneBlock(deploy=deploy, **kw), x)


def test_repvit_block():
    from achelous_tpu.models.repvit import RepViTBlock
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 32))
    _check(lambda deploy: RepViTBlock(32, stride=1, use_se=True,
                                      deploy=deploy), x)


def test_fastvit_repmixer_and_patchembed():
    from achelous_tpu.models.fastvit import (ReparamLargeKernelConv,
                                             RepMixerBlock, RepCPE)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 32))
    _check(lambda deploy: RepMixerBlock(32, 3.0, deploy=deploy), x)
    _check(lambda deploy: ReparamLargeKernelConv(48, 7, 2, groups=8,
                                                 deploy=deploy), x)
    _check(lambda deploy: RepCPE(32, deploy=deploy), x)


def test_full_mobileone_backbone_reparam():
    from achelous_tpu.models.mobileone import MobileOne
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 64, 64, 3))
    # 22 folded blocks with unnormalized activations (~1e4 magnitude):
    # fp32 association error accumulates; per-block tests stay tight
    _check(lambda deploy: MobileOne(phi="S0", deploy=deploy), x,
           atol=5e-3, rtol=3e-3)


def test_full_achelous_rdf_reparam():
    """Full MO-RDF-PN model: train-form fold -> deploy-form equivalence."""
    import jax.numpy as jnp
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model, example_inputs

    cfg = AchelousConfig(phi="S0", backbone="mo", neck="rdf", resolution=64)
    inputs = example_inputs(cfg, 1)
    train_m = create_model(cfg, deploy=False)
    variables = jax.jit(train_m.init)(jax.random.PRNGKey(0), *inputs)
    want = jax.jit(lambda v, *a: train_m.apply(v, *a))(variables, *inputs)

    deploy_vars = reparameterize(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})
    deploy_m = create_model(cfg, deploy=True)
    ref = jax.eval_shape(deploy_m.init, jax.random.PRNGKey(0), *inputs)
    assert jax.tree_util.tree_structure(ref["params"]) == \
        jax.tree_util.tree_structure(deploy_vars["params"])
    got = jax.jit(lambda v, *a: deploy_m.apply(v, *a))(deploy_vars, *inputs)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-2,
                                   rtol=1e-3)
