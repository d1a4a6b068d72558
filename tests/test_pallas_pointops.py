"""Pallas FPS kernel vs the XLA formulation — exact index equality
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from achelous_tpu.ops.pallas_pointops import pallas_farthest_point_sample
from achelous_tpu.ops.pointops import farthest_point_sample


@pytest.mark.parametrize("seed,n,npoint", [(0, 512, 128), (1, 512, 64),
                                           (2, 100, 32)])
def test_pallas_fps_matches_xla(seed, n, npoint):
    xyz = jnp.asarray(np.random.RandomState(seed).randn(3, n, 3),
                      jnp.float32)
    want = np.asarray(farthest_point_sample(xyz, npoint))
    got = np.asarray(pallas_farthest_point_sample(xyz, npoint,
                                                  interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_respects_valid_mask():
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    valid = jnp.asarray(rng.rand(2, 64) > 0.3)
    want = np.asarray(farthest_point_sample(xyz, 16, valid=valid))
    got = np.asarray(pallas_farthest_point_sample(xyz, 16, valid=valid,
                                                  interpret=True))
    np.testing.assert_array_equal(got, want)
    # sanity: no padding/invalid point selected past the seed
    v = np.asarray(valid)
    for b in range(2):
        assert v[b, got[b, 1:]].all()


def test_pallas_fps_duplicate_points_tie_break():
    """All-identical points: every distance ties at 0 after step 1; the
    first-max tie-break must match XLA argmax (lowest index)."""
    xyz = jnp.ones((1, 32, 3), jnp.float32)
    want = np.asarray(farthest_point_sample(xyz, 8))
    got = np.asarray(pallas_farthest_point_sample(xyz, 8, interpret=True))
    np.testing.assert_array_equal(got, want)
