"""Multi-host input sharding (VERDICT r1 item 10).

The reference shards data across DDP ranks with torch's DistributedSampler
(train.py:576-580).  These tests pin the TPU-native equivalent:
data.sampler.DistributedSampler (simulated with explicit rank/replica
parameters — one process here) and the mesh-aware batch placement in
parallel/mesh.py + train/loop.device_batch.
"""
import jax
import numpy as np
import pytest

from achelous_tpu.data.sampler import DistributedSampler
from achelous_tpu.parallel.mesh import (global_shard_batch, local_batch_size,
                                        make_mesh)


def test_sampler_partition_covers_dataset():
    n, r = 103, 4
    shards = [DistributedSampler(n, num_replicas=r, rank=i, seed=5)
              .epoch_indices(epoch=2) for i in range(r)]
    lens = {len(s) for s in shards}
    assert lens == {26}                      # ceil(103/4), equal per rank
    union = np.concatenate(shards)
    # padding wraps: 104 draws over 103 indices -> all covered, one dup
    assert len(np.unique(union)) == n
    assert len(union) == 104


def test_sampler_drop_last_truncates():
    n, r = 103, 4
    shards = [DistributedSampler(n, num_replicas=r, rank=i, drop_last=True)
              .epoch_indices(0) for i in range(r)]
    assert all(len(s) == 25 for s in shards)
    union = np.concatenate(shards)
    assert len(union) == len(np.unique(union)) == 100   # disjoint


def test_sampler_interleaved_split_matches_torch():
    """rank r must take perm[r::R] of the shared permutation — torch
    DistributedSampler's split."""
    n, r = 64, 4
    perm = np.random.RandomState(9 + 3).permutation(n)   # seed + epoch
    for rank in range(r):
        got = DistributedSampler(n, num_replicas=r, rank=rank,
                                 seed=9).epoch_indices(3)
        np.testing.assert_array_equal(got, perm[rank::r])


def test_sampler_deterministic_across_hosts_and_epochs():
    a = DistributedSampler(50, num_replicas=2, rank=0, seed=1)
    b = DistributedSampler(50, num_replicas=2, rank=0, seed=1)
    np.testing.assert_array_equal(a.epoch_indices(4), b.epoch_indices(4))
    assert not np.array_equal(a.epoch_indices(4), a.epoch_indices(5))


def test_sampler_no_shuffle_is_sequential():
    got = DistributedSampler(10, num_replicas=2, rank=1,
                             shuffle=False).epoch_indices(0)
    np.testing.assert_array_equal(got, [1, 3, 5, 7, 9])


def test_global_shard_batch_places_on_mesh():
    mesh = make_mesh(8)
    batch = {"image": np.arange(8 * 4 * 4 * 3, dtype=np.float32)
             .reshape(8, 4, 4, 3),
             "labels": np.arange(8, dtype=np.int32)}
    out = global_shard_batch(batch, mesh)
    for v in out.values():
        assert v.sharding.is_equivalent_to(
            jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec("data")),
            v.ndim)
        # one batch row per device
        assert v.addressable_shards[0].data.shape[0] == 1
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])


def test_local_batch_size_single_process():
    mesh = make_mesh(8)
    assert local_batch_size(32, mesh) == 32   # one process owns all devices


def test_device_batch_with_mesh_shards_and_splats():
    """device_batch(mesh=...) must shard every array AND run the on-device
    radar splat on sharded points."""
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.train.loop import device_batch

    cfg = AchelousConfig(resolution=64, pc_points=16)
    mesh = make_mesh(8)
    batch = {
        "image": np.zeros((8, 64, 64, 3), np.float32),
        "radar_points": np.zeros((8, 16, 5), np.float32),
        "radar_points_valid": np.ones((8, 16), bool),
        "n_valid": 8,
        "indices": np.arange(8),
    }
    out = device_batch(batch, cfg, mesh=mesh)
    assert out["radar"].shape == (8, 64, 64, 3)
    spec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    assert out["image"].sharding.is_equivalent_to(spec, 4)
    assert out["radar"].sharding.is_equivalent_to(spec, 4)
    assert "n_valid" not in out and "indices" not in out


class _FakeDataset:
    """In-memory dataset in the collate() sample schema."""

    def __init__(self, cfg, n):
        self.cfg, self.n = cfg, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = self.cfg.resolution
        return {
            "image": np.full((r, r, 3), i, np.float32),
            "pc": np.zeros((self.cfg.pc_points, self.cfg.pc_channels),
                           np.float32),
            "pc_labels": np.zeros(self.cfg.pc_points, np.int32),
            "seg": np.zeros((r, r), np.int32),
            "wl": np.zeros((r, r), np.int32),
            "boxes": np.array([[10, 10, 20, 20, 0]], np.float32),
            "radar_map": np.zeros((r, r, 3), np.float32),
        }


def test_batches_from_uses_sampler_shard():
    """batches_from(sampler=...) iterates exactly this rank's indices; the
    two ranks together cover the whole dataset."""
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.train.loop import batches_from

    cfg = AchelousConfig(resolution=64, pc_points=16)
    ds = _FakeDataset(cfg, 12)
    seen = []
    for rank in range(2):
        s = DistributedSampler(len(ds), num_replicas=2, rank=rank, seed=0)
        shard = []
        for b in batches_from(ds, cfg, 2, 8, True, np.random.RandomState(0),
                              sampler=s, epoch=1):
            shard.extend(b["indices"])
        np.testing.assert_array_equal(shard, s.epoch_indices(1))
        seen.extend(shard)
    assert sorted(set(seen)) == list(range(12))   # both shards cover all


@pytest.mark.slow   # whole-model compile on the CPU mesh
def test_sharded_infer_keeps_pallas_kernels():
    """VERDICT r3 weak 4: the GSPMD entry points must keep the Pallas
    kernels live (shard_map per batch shard, core/kernels.shard_wrap), not
    silently downgrade to the XLA fallbacks.  One ef-gdf-pn2 config
    exercises all three kernels (fused bias-attention, banded deform, FPS)
    in interpret mode on the 8-device CPU mesh; outputs must equal the
    single-device XLA-composition program."""
    import jax.numpy as jnp
    from achelous_tpu.core import kernels
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.predict import AchelousPredictor

    cfg = AchelousConfig(phi="S0", backbone="ef", neck="gdf", pc_model="pn2",
                         resolution=64)
    p = AchelousPredictor(cfg, confidence=0.05, nms_iou=0.5)
    rng = np.random.RandomState(3)
    b = 8
    img = jnp.asarray(rng.rand(b, 64, 64, 3), cfg.dtype)
    rad = jnp.asarray(rng.rand(b, 64, 64, 3), cfg.dtype)
    pc = jnp.asarray(rng.rand(b, cfg.pc_points, cfg.pc_channels), cfg.dtype)

    mesh = make_mesh()
    before = kernels.shard_map_count
    with kernels.pallas_interpret():
        sharded = p.sharded_infer(mesh)
        got = jax.tree_util.tree_map(np.asarray,
                                     sharded(p.variables, img, rad, pc))
    # the kernels were actually wrapped over the mesh, not skipped
    assert kernels.shard_map_count > before
    want = p._infer(p.variables, img, rad, pc)   # CPU default: XLA paths

    flat_g = jax.tree_util.tree_leaves(got)
    flat_w = jax.tree_util.tree_leaves(want)
    assert len(flat_g) == len(flat_w)
    for g, w in zip(flat_g, flat_w):
        g, w = np.asarray(g), np.asarray(w)
        if g.dtype == bool or np.issubdtype(g.dtype, np.integer):
            np.testing.assert_array_equal(g, w)
        else:
            np.testing.assert_allclose(g.astype(np.float32),
                                       w.astype(np.float32),
                                       rtol=1e-5, atol=1e-5)


def test_deform_grad_under_mesh_matches_single_device():
    """Training under a mesh differentiates the Pallas deform kernel through
    shard_map: its custom_vjp (the XLA banded pullback) must produce the
    same gradients as the plain single-device XLA path."""
    import jax.numpy as jnp
    from achelous_tpu.core import kernels
    from achelous_tpu.ops.deform import deform_conv2d
    from achelous_tpu.parallel.mesh import batch_sharding, replicated

    rng = np.random.RandomState(0)
    b, h, w, c, k = 8, 16, 16, 8, 9
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (b, h, w, 2 * k)), jnp.float32)
    mask = jnp.asarray(rng.rand(b, h, w, k), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)

    def loss(x_, o_, m_, w_):
        return deform_conv2d(x_, o_, m_, w_, band=2).astype(
            jnp.float32).sum()

    want = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, mask, wgt)

    mesh = make_mesh()
    sh, rep = batch_sharding(mesh), replicated(mesh)

    def loss_mesh(x_, o_, m_, w_):
        with kernels.pallas_batch_mesh(mesh):
            return loss(x_, o_, m_, w_)

    with kernels.pallas_interpret():
        got = jax.jit(jax.grad(loss_mesh, argnums=(0, 1, 2, 3)),
                      in_shardings=(sh, sh, sh, rep))(x, off, mask, wgt)
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow   # whole-model compile on the CPU mesh
def test_sharded_infer_matches_single_device():
    """Data-parallel inference over the 8-device CPU mesh must equal the
    single-device program leaf-for-leaf — the TPU-native replacement for
    the reference's DataParallel inference wrap (achelous.py:176).
    Eval-mode inference crosses no batch boundaries (BN uses running
    stats; NMS is per-image), so the results must agree to partition-
    induced float rounding (measured ~1e-7 rel: XLA tiles the per-shard
    program differently), with the DISCRETE outputs — NMS survivor set,
    class indices — bit-identical."""
    import jax.numpy as jnp
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.predict import AchelousPredictor

    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", pc_model="pn",
                         resolution=64)
    p = AchelousPredictor(cfg, confidence=0.05, nms_iou=0.5)
    rng = np.random.RandomState(0)
    b = 8
    img = jnp.asarray(rng.rand(b, 64, 64, 3), cfg.dtype)
    rad = jnp.asarray(rng.rand(b, 64, 64, 3), cfg.dtype)
    pc = jnp.asarray(rng.rand(b, cfg.pc_points, cfg.pc_channels), cfg.dtype)

    mesh = make_mesh()
    assert mesh.size == 8                    # conftest's virtual CPU devices
    sharded = p.sharded_infer(mesh)
    got = sharded(p.variables, img, rad, pc)
    want = p._infer(p.variables, img, rad, pc)

    flat_g, tree_g = jax.tree_util.tree_flatten(got)
    flat_w, tree_w = jax.tree_util.tree_flatten(want)
    assert tree_g == tree_w
    for g, w in zip(flat_g, flat_w):
        # sharded leaves span the mesh
        assert len(g.sharding.device_set) == 8
        g, w = np.asarray(g), np.asarray(w)
        if g.dtype == bool or np.issubdtype(g.dtype, np.integer):
            np.testing.assert_array_equal(g, w)
        else:
            np.testing.assert_allclose(g.astype(np.float32),
                                       w.astype(np.float32),
                                       rtol=1e-5, atol=1e-5)


def test_fused_radarconv_under_mesh_matches_single_device():
    """The fused RadarConv kernel (r4's fourth Pallas kernel,
    ops/pallas_deform.pallas_fused_radarconv) gates on PER-SHARD batch
    (ops/deform.py fuse_bs), so it CAN engage under a batch mesh — 8
    global / 8 devices = 1 <= 2.  Mesh-mode fused output and gradients
    must equal the single-device XLA composition (VERDICT r4 weak 7)."""
    import jax.numpy as jnp
    from achelous_tpu.core import kernels
    from achelous_tpu.ops.deform import DeformableConv2d
    from achelous_tpu.parallel.mesh import batch_sharding, replicated

    rng = np.random.RandomState(1)
    b, h, w, c = 8, 16, 16, 3
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    mod = DeformableConv2d(features=c, band=2, input_pool=True)
    with kernels.no_pallas():
        variables = mod.init(jax.random.PRNGKey(0), x)
    # non-zero offsets so the kernel leaves tier 0
    variables = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape) * 0.3, p.dtype), variables)

    with kernels.no_pallas():
        want = mod.apply(variables, x)
        want_g = jax.grad(lambda v, xx: mod.apply(v, xx).astype(
            jnp.float32).sum(), argnums=(0, 1))(variables, x)

    mesh = make_mesh()
    sh, rep = batch_sharding(mesh), replicated(mesh)

    def fwd_mesh(v, xx):
        with kernels.pallas_batch_mesh(mesh):
            return mod.apply(v, xx)

    before = kernels.shard_map_count
    with kernels.pallas_interpret():
        got = jax.jit(fwd_mesh, in_shardings=(rep, sh))(variables, x)
        got_g = jax.jit(jax.grad(lambda v, xx: fwd_mesh(v, xx).astype(
            jnp.float32).sum(), argnums=(0, 1)),
            in_shardings=(rep, sh))(variables, x)
    assert kernels.shard_map_count > before     # the kernel actually wrapped
    assert len(got.sharding.device_set) == 8    # output stayed sharded
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    for g, wv in zip(jax.tree_util.tree_leaves(got_g),
                     jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=1e-4, atol=1e-5)
