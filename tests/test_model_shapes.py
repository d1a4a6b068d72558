"""Golden shape + param-count tests for the EN-GDF-PN family.

Shapes follow the reference output contract (nets/Achelous.py:49-53); the
param count is verified against the reference EdgeNeXt backbone
(1,312,276 params for edgenext_xx_small without the unused classifier head)
and the published 3.55M total for EN-GDF-PN-S0 (README.md:81).

Tests run at reduced resolution (64) where only shapes matter — the model is
fully resolution-polymorphic (any multiple of 32).
"""
import jax
import jax.numpy as jnp
import pytest

from achelous_tpu.core.config import AchelousConfig, WIDTHS
from achelous_tpu.models.achelous import create_model, example_inputs
from achelous_tpu.models.edgenext import EDGENEXT_VARIANTS


def n_params(tree):
    return sum(p.size for p in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("phi", ["S0", "S1", "S2"])
def test_edgenext_feature_shapes(phi):
    model = EDGENEXT_VARIANTS[phi]()
    x = jnp.zeros((1, 96, 96, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(model.apply)(params, x)
    widths = WIDTHS[phi]
    strides = (4, 8, 16, 32)
    assert len(feats) == 4
    for f, w, s in zip(feats, widths, strides):
        assert f.shape == (1, 96 // s, 96 // s, w), f.shape


def test_edgenext_xx_small_param_count():
    # golden: reference backbone-only param count (edgenext_xx_small minus the
    # never-used classifier norm+head), measured from the reference model.
    model = EDGENEXT_VARIANTS["S0"]()
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
    assert n_params(params) == 1_312_276


def _init_and_apply(cfg, batch=1):
    model = create_model(cfg)
    inputs = example_inputs(cfg, batch)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
    out = jax.jit(lambda v, *a: model.apply(v, *a))(variables, *inputs)
    return variables, out


def test_achelous_en_gdf_pn_outputs():
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", pc_model="pn",
                         resolution=64)
    variables, (det, sem, lane, pc) = _init_and_apply(cfg)
    r = cfg.resolution
    assert len(det) == 3
    for d, s in zip(det, (8, 16, 32)):
        assert d.shape == (1, r // s, r // s, 5 + cfg.num_det), d.shape
    assert sem.shape == (1, r, r, cfg.num_seg)
    assert lane.shape == (1, r, r, 2)
    assert pc.shape == (1, cfg.pc_points, cfg.pc_classes)
    # pc output is log-probs (reference pointnet_sem_seg.py:35)
    assert jnp.allclose(jnp.sum(jnp.exp(pc), axis=-1), 1.0, atol=1e-4)
    # resolution-independent param count matches README.md:81 (3.55M at the
    # same counting convention; ours counts every created parameter).
    assert n_params(variables["params"]) == 3_568_063


def test_achelous_3t_variant():
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", resolution=64)
    model = create_model(cfg, with_pc=False)
    img, rad, _ = example_inputs(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, rad)
    det, sem, lane = jax.jit(lambda v, *a: model.apply(v, *a))(variables, img, rad)
    assert len(det) == 3 and sem.shape[-1] == cfg.num_seg


def test_cdf_neck():
    cfg = AchelousConfig(phi="S0", backbone="en", neck="cdf", resolution=64)
    _, (det, sem, lane, pc) = _init_and_apply(cfg)
    assert det[0].shape[-1] == 5 + cfg.num_det


def test_param_dtype_is_float32_with_bf16_compute():
    cfg = AchelousConfig(phi="S0", dtype=jnp.bfloat16, resolution=64)
    variables, (det, sem, lane, pc) = _init_and_apply(cfg)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert det[0].dtype == jnp.bfloat16


@pytest.mark.parametrize("backbone,neck", [("mo", "rdf"), ("fv", "rdf"),
                                           ("mv", "gdf"), ("ef", "gdf"),
                                           ("ev", "cdf"), ("pf", "gdf"),
                                           ("rv", "gdf")])
def test_full_model_all_backbones(backbone, neck):
    cfg = AchelousConfig(phi="S0", backbone=backbone, neck=neck,
                         resolution=64)
    _, (det, sem, lane, pc) = _init_and_apply(cfg)
    assert det[0].shape[-1] == 5 + cfg.num_det
    assert sem.shape[-1] == cfg.num_seg
