"""Backbone zoo: golden param counts (measured from the reference models) and
feature-shape contracts (4 maps at strides 4/8/16/32 with the shared width
table)."""
import jax
import jax.numpy as jnp
import pytest

from achelous_tpu.core.config import WIDTHS

# golden parameter counts measured by running the reference torch models
# (backbone only, no classifier heads); see SURVEY.md §2.1 file refs.
GOLDEN_PARAMS = {
    ("en", "S0"): 1_312_276, ("en", "S1"): 2_840_268, ("en", "S2"): 4_390_984,
    ("mv", "S0"): 1_253_840, ("mv", "S1"): 2_329_184, ("mv", "S2"): 4_669_744,
    ("ef", "S0"): 3_249_872, ("ef", "S1"): 5_739_224, ("ef", "S2"): 12_137_488,
    ("ev", "S0"): 1_556_816, ("ev", "S1"): 1_805_104, ("ev", "S2"): 5_772_352,
    ("pf", "S0"): 1_216_320, ("pf", "S1"): 3_437_304, ("pf", "S2"): 7_747_824,
    ("rv", "S0"): 1_134_568, ("rv", "S1"): 1_618_504, ("rv", "S2"): 3_055_436,
    ("mo", "S0"): 583_072, ("mo", "S1"): 216_160, ("mo", "S2"): 311_616,
    ("fv", "S0"): 915_520, ("fv", "S1"): 1_581_376, ("fv", "S2"): 3_026_208,
}


def get_variant(name, phi, res=320):
    if name == "en":
        from achelous_tpu.models.edgenext import EDGENEXT_VARIANTS
        return EDGENEXT_VARIANTS[phi]()
    if name == "mv":
        from achelous_tpu.models.mobilevit import MOBILEVIT_VARIANTS
        return MOBILEVIT_VARIANTS[phi]()
    if name == "ef":
        from achelous_tpu.models.efficientformer import EFORMER_VARIANTS
        return EFORMER_VARIANTS[phi](resolution=res)
    if name == "ev":
        from achelous_tpu.models.edgevit import EDGEVIT_VARIANTS
        return EDGEVIT_VARIANTS[phi]()
    if name == "pf":
        from achelous_tpu.models.poolformer import POOLFORMER_VARIANTS
        return POOLFORMER_VARIANTS[phi]()
    if name == "rv":
        from achelous_tpu.models.repvit import REPVIT_VARIANTS
        return REPVIT_VARIANTS[phi]()
    if name == "mo":
        from achelous_tpu.models.mobileone import MOBILEONE_VARIANTS
        return MOBILEONE_VARIANTS[phi]()
    if name == "fv":
        from achelous_tpu.models.fastvit import FASTVIT_VARIANTS
        return FASTVIT_VARIANTS[phi]()
    raise KeyError(name)


@pytest.mark.parametrize("name,phi", sorted(GOLDEN_PARAMS))
def test_param_count_matches_reference(name, phi):
    model = get_variant(name, phi, res=320)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros((1, 320, 320, 3)))
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert n == GOLDEN_PARAMS[(name, phi)], (name, phi, n)


@pytest.mark.parametrize("name", ["mv", "ef", "ev", "pf", "rv", "mo", "fv"])
def test_feature_shapes(name):
    res = 64
    model = get_variant(name, "S0", res=res)
    x = jnp.zeros((1, res, res, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    widths = WIDTHS["S0"]
    assert len(feats) == 4
    for f, w, s in zip(feats, widths, (4, 8, 16, 32)):
        assert f.shape == (1, res // s, res // s, w), (name, f.shape)
