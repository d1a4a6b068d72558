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


def test_fps_auto_gate_batches(monkeypatch):
    """The auto path (use_pallas=None) takes the Pallas kernel only up to
    ACHELOUS_FPS_PALLAS_MAX_BATCH per shard: the kernel's grid is per batch
    element (cost linear in batch) while the XLA loop is dispatch-bound
    (near-constant) — Pallas loses 3.4x at bs=32 (LATENCY_ABLATION.json)."""
    import achelous_tpu.ops.pallas_pointops as pp
    from achelous_tpu.core.kernels import pallas_interpret

    calls = []
    real = pp.pallas_farthest_point_sample

    def spy(*a, **kw):
        calls.append(a[0].shape[0])
        return real(*a, **kw)

    monkeypatch.setattr(pp, "pallas_farthest_point_sample", spy)
    rng = np.random.RandomState(0)
    small = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    big = jnp.asarray(rng.randn(16, 64, 3), jnp.float32)
    with pallas_interpret():
        farthest_point_sample(small, 8)
        assert calls == [2]          # small batch -> kernel
        got = farthest_point_sample(big, 8)
        assert calls == [2]          # large batch -> XLA fallback
    want = farthest_point_sample(big, 8)   # no scope: plain XLA
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
