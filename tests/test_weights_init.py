"""weights_init parity (reference loss/detection_loss.py:466-485).

The reference re-draws every Conv*.weight with one of four schemes and every
BatchNorm2d scale/bias with N(1, 0.02)/0, leaving Linear layers alone
(classname filter 'Conv').  These tests check the pytree transform reproduces
each scheme's distribution and touches exactly the right leaves.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from achelous_tpu.core.init import weights_init
from achelous_tpu.ops.norm import F32BatchNorm


class _Toy(nn.Module):
    """conv (+BN) + dense + LayerNorm — one leaf of every relevant kind."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (3, 3), name="conv")(x)
        x = F32BatchNorm(use_running_average=not train, name="bn")(x)
        x = nn.LayerNorm(name="ln")(x)
        x = nn.Dense(16, name="dense")(x)
        return x


@pytest.fixture(scope="module")
def toy_vars():
    model = _Toy()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 32)))
    return v["params"], v["batch_stats"]


def test_normal_scheme_statistics(toy_vars):
    params, bstats = toy_vars
    new = weights_init(params, bstats, jax.random.PRNGKey(1),
                       "normal", 0.02)
    k = np.asarray(new["conv"]["kernel"])
    assert abs(k.std() - 0.02) < 0.002 and abs(k.mean()) < 0.002
    s = np.asarray(new["bn"]["scale"])
    assert abs(s.mean() - 1.0) < 0.02 and abs(s.std() - 0.02) < 0.01
    assert np.all(np.asarray(new["bn"]["bias"]) == 0.0)


def test_untouched_leaves(toy_vars):
    params, bstats = toy_vars
    new = weights_init(params, bstats, jax.random.PRNGKey(1),
                       "normal", 0.02)
    # Linear kernels/biases and LayerNorm are outside the classname filter
    np.testing.assert_array_equal(np.asarray(new["dense"]["kernel"]),
                                  np.asarray(params["dense"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(new["ln"]["scale"]),
                                  np.asarray(params["ln"]["scale"]))
    np.testing.assert_array_equal(np.asarray(new["conv"]["bias"]),
                                  np.asarray(params["conv"]["bias"]))


def test_kaiming_scheme_statistics(toy_vars):
    params, bstats = toy_vars
    new = weights_init(params, bstats, jax.random.PRNGKey(2), "kaiming")
    k = np.asarray(new["conv"]["kernel"])
    fan_in = 3 * 3 * 32
    assert abs(k.std() - np.sqrt(2.0 / fan_in)) < 0.005


def test_xavier_scheme_statistics(toy_vars):
    params, bstats = toy_vars
    new = weights_init(params, bstats, jax.random.PRNGKey(3),
                       "xavier", 1.0)
    k = np.asarray(new["conv"]["kernel"])
    fan_in, fan_out = 3 * 3 * 32, 3 * 3 * 64
    assert abs(k.std() - np.sqrt(2.0 / (fan_in + fan_out))) < 0.005


def test_orthogonal_scheme(toy_vars):
    params, bstats = toy_vars
    new = weights_init(params, bstats, jax.random.PRNGKey(4),
                       "orthogonal", 1.0)
    k = np.asarray(new["conv"]["kernel"]).reshape(-1, 64)
    np.testing.assert_allclose(k.T @ k, np.eye(64), atol=1e-4)


def test_unknown_scheme_raises(toy_vars):
    params, bstats = toy_vars
    with pytest.raises(NotImplementedError):
        weights_init(params, bstats, jax.random.PRNGKey(0), "bogus")


def test_create_train_state_applies_init():
    """TrainConfig.init_type wires through create_train_state."""
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model, example_inputs
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state)

    cfg = AchelousConfig(resolution=64, pc_points=32)
    model = create_model(cfg)
    inputs = example_inputs(cfg, 1)
    s_def = create_train_state(model, cfg, TrainConfig(),
                               jax.random.PRNGKey(0), inputs)
    s_ref = create_train_state(model, cfg, TrainConfig(init_type="normal"),
                               jax.random.PRNGKey(0), inputs)
    # find one conv kernel and confirm the re-draw happened
    flat_def = jax.tree_util.tree_flatten_with_path(s_def.params)[0]
    flat_ref = {tuple(k.key for k in kp): v for kp, v
                in jax.tree_util.tree_flatten_with_path(s_ref.params)[0]}
    checked = 0
    for kp, leaf in flat_def:
        names = tuple(k.key for k in kp)
        if names[-1] == "kernel" and leaf.ndim >= 3:
            other = np.asarray(flat_ref[names])
            assert not np.allclose(np.asarray(leaf), other)
            assert abs(other.std() - 0.02) < 0.01
            checked += 1
            if checked >= 3:
                break
    assert checked >= 3
