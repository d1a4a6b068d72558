"""PointNet++ ops and model tests: FPS/ball-query semantics vs numpy oracles,
output contract, and the EN-GDF-PN2-S0 assembly."""
import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.models.achelous import create_model, example_inputs
from achelous_tpu.models.pointnet2 import PointNet2Seg
from achelous_tpu.ops.pointops import (ball_query, farthest_point_sample,
                                       index_points)


def np_fps(xyz, npoint):
    n = xyz.shape[0]
    dist = np.full(n, 1e10)
    idxs = np.zeros(npoint, int)
    far = 0
    for i in range(npoint):
        idxs[i] = far
        d = ((xyz - xyz[far]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        far = int(np.argmax(dist))
    return idxs


def test_fps_matches_oracle():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))


def test_fps_spreads_points():
    # FPS of 4 from the corners of a square + center cluster picks corners
    pts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [10, 10, 0],
                    [5, 5, 0], [5.1, 5, 0]], np.float32)[None]
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 4))[0]
    assert set(idx.tolist()) <= {0, 1, 2, 3, 4}   # never both cluster points


def test_ball_query_first_k_and_padding():
    xyz = jnp.asarray(np.array(
        [[[0, 0, 0], [0.05, 0, 0], [0.08, 0, 0], [5, 5, 5]]], np.float32))
    centers = xyz[:, :1]
    idx = np.asarray(ball_query(0.1, 3, xyz, centers))[0, 0]
    np.testing.assert_array_equal(idx, [0, 1, 2])
    # nsample larger than in-radius count: pad with first found
    idx = np.asarray(ball_query(0.06, 3, xyz, centers))[0, 0]
    np.testing.assert_array_equal(idx, [0, 1, 0])


def test_index_points():
    pts = jnp.arange(24, dtype=jnp.float32).reshape(1, 8, 3)
    idx = jnp.asarray([[[1, 3], [0, 7]]])
    out = np.asarray(index_points(pts, idx))
    np.testing.assert_array_equal(out[0, 0, 0], [3, 4, 5])
    np.testing.assert_array_equal(out[0, 1, 1], [21, 22, 23])


def test_pointnet2_output_contract_and_params():
    m = PointNet2Seg(num_classes=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 512, 5), jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    lp, _ = jax.jit(lambda v, x: m.apply(v, x))(v, x)
    assert lp.shape == (2, 512, 8)
    assert np.allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, atol=1e-4)
    n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    # canonical pointnet2_sem_seg is ~0.97M params
    assert 0.9e6 < n < 1.05e6, n


def test_en_gdf_pn2_assembly():
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", pc_model="pn2",
                         resolution=64)
    model = create_model(cfg)
    inputs = example_inputs(cfg, 1)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
    det, sem, lane, pc = jax.jit(lambda v, *a: model.apply(v, *a))(v, *inputs)
    assert pc.shape == (1, cfg.pc_points, cfg.pc_classes)
