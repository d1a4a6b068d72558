"""Numerical forward parity against the reference PyTorch code.

The reference ships no trained weights, so parity is proven by transplanting
randomly-initialized torch weights into the flax modules and comparing
forward outputs (eval mode, default BN running stats).  Requires torch (cpu)
and the read-only reference checkout; skipped if either is absent.

tests/torch_shims/ contains a minimal stand-in for the timm==0.6.7 APIs the
reference imports (DropPath/trunc_normal_/SqueezeExcite/...), written from
the API surface — timm itself is not installed in this image.
"""
import os
import sys

import numpy as np
import pytest

# torch transplant + per-module XLA compiles: the heavyweight tier
# (run fast tier with -m 'not slow')
pytestmark = pytest.mark.slow

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "torch_shims")

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

for p in (SHIM, REF):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_torch():
    """Deterministic torch inits: with random weights, fp32-vs-torch
    tolerances are distributional — an unlucky draw can exceed 2e-3 rtol
    (observed once on mobileone).  Seeding removes the flake without
    loosening the tolerance."""
    torch.manual_seed(1234)


def t2j(t):
    return np.asarray(t.detach().numpy())


def conv_t2j(w):
    """torch conv2d [out, in/groups, kh, kw] -> flax [kh, kw, in/groups, out]."""
    return t2j(w).transpose(2, 3, 1, 0)


def dense_t2j(w):
    return t2j(w).T


def bn_t2j(bn):
    params = {"scale": t2j(bn.weight), "bias": t2j(bn.bias)}
    stats = {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}
    return params, stats


def ln_t2j(ln):
    return {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}


# ---------------------------------------------------------------------------
# PointNet
# ---------------------------------------------------------------------------


def _map_stn(tm, k):
    p = {}
    for i, name in enumerate(["conv1", "conv2", "conv3"], 1):
        conv = getattr(tm, f"conv{i}")
        p[f"{name}_dense"] = {"kernel": t2j(conv.weight)[:, :, 0].T,
                              "bias": t2j(conv.bias)}
        bp, bs = bn_t2j(getattr(tm, f"bn{i}"))
        p[f"{name}_bn"] = bp
    for i, name in enumerate(["fc1", "fc2"], 1):
        fc = getattr(tm, f"fc{i}")
        p[f"{name}_dense"] = {"kernel": dense_t2j(fc.weight),
                              "bias": t2j(fc.bias)}
        bp, _ = bn_t2j(getattr(tm, f"bn{i + 3}"))
        p[f"{name}_bn"] = bp
    p["fc3"] = {"kernel": dense_t2j(tm.fc3.weight), "bias": t2j(tm.fc3.bias)}
    stats = {}
    for i, name in enumerate(["conv1", "conv2", "conv3"], 1):
        _, bs = bn_t2j(getattr(tm, f"bn{i}"))
        stats[f"{name}_bn"] = bs
    for i, name in enumerate(["fc1", "fc2"], 1):
        _, bs = bn_t2j(getattr(tm, f"bn{i + 3}"))
        stats[f"{name}_bn"] = bs
    return p, stats


def test_pointnet_forward_parity():
    from nets.pointcloudseg.pointnet2.pointnet_sem_seg import PointNet_SEG
    from achelous_tpu.models.pointnet import PointNetSeg

    tm = PointNet_SEG(num_class=8, point_cloud_channels=5).eval()
    jm = PointNetSeg(num_classes=8)
    x_np = np.random.RandomState(0).randn(2, 5, 512).astype(np.float32)

    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 1)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    feat = tm.feat
    params["feat"] = dict(params["feat"])
    p, s = _map_stn(feat.stn, 3)
    params["feat"]["stn"], stats["feat"]["stn"] = p, s
    p, s = _map_stn(feat.fstn, 32)
    params["feat"]["fstn"], stats["feat"]["fstn"] = p, s
    for i in (1, 2, 3):
        conv = getattr(feat, f"conv{i}")
        params["feat"][f"conv{i}_dense"] = {
            "kernel": t2j(conv.weight)[:, :, 0].T, "bias": t2j(conv.bias)}
        bp, bs = bn_t2j(getattr(feat, f"bn{i}"))
        params["feat"][f"conv{i}_bn"] = bp
        stats["feat"][f"conv{i}_bn"] = bs
    for i, torch_name in enumerate(["conv1", "conv2", "conv3"], 1):
        conv = getattr(tm, torch_name)
        params[f"conv{i}_dense"] = {"kernel": t2j(conv.weight)[:, :, 0].T,
                                    "bias": t2j(conv.bias)}
        bp, bs = bn_t2j(getattr(tm, f"bn{i}"))
        params[f"conv{i}_bn"] = bp
        stats[f"conv{i}_bn"] = bs
    params["conv4"] = {"kernel": t2j(tm.conv4.weight)[:, :, 0].T,
                       "bias": t2j(tm.conv4.bias)}

    with torch.no_grad():
        want = tm(torch.from_numpy(x_np)).numpy()
    got, _ = jm.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x_np.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# EfficientFormerV2 backbone (via the torch_import transplant engine)
# ---------------------------------------------------------------------------


def state_dict_np(tm):
    return {k: v.detach().numpy() for k, v in tm.state_dict().items()}


def test_efficientformer_forward_parity():
    from backbone.vision.ImageEncoder import image_encoder_s0
    from achelous_tpu.models.efficientformer import image_encoder_s0 as jx
    from achelous_tpu.utils.torch_import import (efficientformer_mapping,
                                                 transplant)

    tm = image_encoder_s0(resolution=64).eval()
    jm = jx(resolution=64, use_pallas_attention=False)
    x_np = np.random.RandomState(2).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        efficientformer_mapping("S0"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# MobileViT backbone
# ---------------------------------------------------------------------------


def test_mobilevit_forward_parity():
    from backbone.vision.mobilevit_modules.mobilevit import mobilevit_xxs
    from achelous_tpu.models.mobilevit import mobilevit_xxs as jx
    from achelous_tpu.utils.torch_import import (mobilevit_mapping,
                                                 transplant)

    tm = mobilevit_xxs(resolution=64).eval()
    jm = jx()
    x_np = np.random.RandomState(3).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        mobilevit_mapping("S0"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# EdgeViT backbone
# ---------------------------------------------------------------------------


def test_edgevit_forward_parity():
    from backbone.vision.edgevit_modules.edgevit import edgevit_xxs
    from achelous_tpu.models.edgevit import edgevit_xxs as jx
    from achelous_tpu.utils.torch_import import edgevit_mapping, transplant

    tm = edgevit_xxs(resolution=64).eval()
    jm = jx()
    x_np = np.random.RandomState(4).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        edgevit_mapping("S0"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# RepViT backbone
# ---------------------------------------------------------------------------


def test_repvit_forward_parity():
    from backbone.vision.repvit_modules.repvit import repvit_m1
    from achelous_tpu.models.repvit import repvit_m1 as jx
    from achelous_tpu.utils.torch_import import repvit_mapping, transplant

    tm = repvit_m1().eval()
    jm = jx()
    x_np = np.random.RandomState(5).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        repvit_mapping("S0"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# PoolFormer backbone
# ---------------------------------------------------------------------------


def test_poolformer_forward_parity():
    from backbone.vision.poolformer_modules.poolformer import poolformer_S0
    from achelous_tpu.models.poolformer import poolformer_s0 as jx
    from achelous_tpu.utils.torch_import import (poolformer_mapping,
                                                 transplant)

    tm = poolformer_S0().eval()
    jm = jx()
    x_np = np.random.RandomState(6).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        poolformer_mapping("S0"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# MobileOne backbone
# ---------------------------------------------------------------------------


def test_mobileone_forward_parity():
    from backbone.vision.mobileone_modules.mobileone import mobileone
    from achelous_tpu.models.mobileone import mobileone_s0 as jx
    from achelous_tpu.utils.torch_import import mobileone_mapping, transplant

    tm = mobileone(variant="S0").eval()
    jm = jx()
    x_np = np.random.RandomState(7).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        mobileone_mapping("S0"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# FastViT backbone
# ---------------------------------------------------------------------------


def test_fastvit_forward_parity():
    from backbone.vision.fastvit_modules.fastvit import fastvit_s0
    from achelous_tpu.models.fastvit import fastvit_s0 as jx
    from achelous_tpu.utils.torch_import import fastvit_mapping, transplant

    tm = fastvit_s0(fork_feat=True).eval()
    jm = jx()
    x_np = np.random.RandomState(8).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        fastvit_mapping("S0"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# RCNet radar encoder (exercises the deformable-conv kernel with random,
# non-zero offsets/modulators against torchvision.ops.deform_conv2d)
# ---------------------------------------------------------------------------


def test_rcnet_forward_parity():
    from backbone.radar.RadarEncoder import RCNet as TorchRCNet
    from achelous_tpu.models.rcnet import RCNet
    from achelous_tpu.utils.torch_import import rcnet_mapping, transplant

    tm = TorchRCNet(in_channels=3, phi="S0").eval()
    # randomize the zero-initialized offset/modulator convs so the deformable
    # sampling actually moves off-grid
    with torch.no_grad():
        for mod in tm.modules():
            if type(mod).__name__ == "DeformableConv2d":
                mod.offset_conv.weight.normal_(0, 0.05)
                mod.offset_conv.bias.normal_(0, 0.2)
                mod.modulator_conv.weight.normal_(0, 0.05)
                mod.modulator_conv.bias.normal_(0, 0.2)
    jm = RCNet(phi="S0")
    x_np = np.random.RandomState(9).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        rcnet_mapping("S0"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Full EN-GDF-PN-S0 assembly (backbone + GDF neck + RCNet + IR fusion +
# DecoupleHead + PointNet in one transplanted forward)
# ---------------------------------------------------------------------------


def test_full_achelous_forward_parity():
    from nets.Achelous import Achelous as TorchAchelous
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.utils.torch_import import achelous_mapping, transplant

    tm = TorchAchelous(num_det=7, num_seg=9, phi="S0", resolution=64,
                       backbone="en", neck="gdf", pc_seg="pn", pc_channels=5,
                       pc_classes=8, nano_head=True, spp=True).eval()
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", resolution=64)
    jm = create_model(cfg)

    rng = np.random.RandomState(10)
    img = rng.randn(1, 3, 64, 64).astype(np.float32)
    rad = rng.randn(1, 3, 64, 64).astype(np.float32)
    pc = rng.randn(1, 5, 512).astype(np.float32)

    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(img.transpose(0, 2, 3, 1)),
                        jnp.asarray(rad.transpose(0, 2, 3, 1)),
                        jnp.asarray(pc.transpose(0, 2, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        achelous_mapping("S0", "en", "gdf"))

    with torch.no_grad():
        det_t, sem_t, lane_t, pc_t = tm(torch.from_numpy(img),
                                        torch.from_numpy(rad),
                                        torch.from_numpy(pc))
    det_j, sem_j, lane_j, pc_j = jm.apply(
        new_vars, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(rad.transpose(0, 2, 3, 1)),
        jnp.asarray(pc.transpose(0, 2, 1)))

    for g, w in zip(det_j, det_t):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sem_j).transpose(0, 3, 1, 2),
                               sem_t.numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(lane_j).transpose(0, 3, 1, 2),
                               lane_t.numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pc_j), pc_t.numpy(),
                               rtol=5e-3, atol=5e-4)


def _assembly_parity(phi, backbone, neck, seed, resolution=64):
    from nets.Achelous import Achelous as TorchAchelous
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.utils.torch_import import achelous_mapping, transplant

    tm = TorchAchelous(num_det=7, num_seg=9, phi=phi, resolution=resolution,
                       backbone=backbone, neck=neck, pc_seg="pn",
                       pc_channels=5, pc_classes=8, nano_head=True,
                       spp=True).eval()
    cfg = AchelousConfig(phi=phi, backbone=backbone, neck=neck,
                         resolution=resolution)
    jm = create_model(cfg)

    rng = np.random.RandomState(seed)
    img = rng.randn(1, 3, resolution, resolution).astype(np.float32)
    rad = rng.randn(1, 3, resolution, resolution).astype(np.float32)
    pc = rng.randn(1, 5, 512).astype(np.float32)
    jargs = (jnp.asarray(img.transpose(0, 2, 3, 1)),
             jnp.asarray(rad.transpose(0, 2, 3, 1)),
             jnp.asarray(pc.transpose(0, 2, 1)))
    variables = jax.jit(jm.init)(jax.random.PRNGKey(0), *jargs)
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        achelous_mapping(phi, backbone, neck))

    with torch.no_grad():
        det_t, sem_t, lane_t, pc_t = tm(torch.from_numpy(img),
                                        torch.from_numpy(rad),
                                        torch.from_numpy(pc))
    det_j, sem_j, lane_j, pc_j = jm.apply(new_vars, *jargs)
    for g, w in zip(det_j, det_t):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sem_j).transpose(0, 3, 1, 2),
                               sem_t.numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(lane_j).transpose(0, 3, 1, 2),
                               lane_t.numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pc_j), pc_t.numpy(),
                               rtol=5e-3, atol=5e-4)


def test_pth_importer_roundtrip(tmp_path):
    """tools/import_torch_weights round-trips a .pth state_dict into flax
    variables whose forward matches the torch model (VERDICT item 7;
    reference train.py:353-370)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "import_torch_weights",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "import_torch_weights.py"))
    itw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(itw)

    from nets.Achelous import Achelous as TorchAchelous
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model

    tm = TorchAchelous(num_det=7, num_seg=9, phi="S0", resolution=64,
                       backbone="en", neck="gdf", pc_seg="pn", pc_channels=5,
                       pc_classes=8, nano_head=True, spp=True).eval()
    pth = tmp_path / "ref.pth"
    torch.save(tm.state_dict(), str(pth))
    out = tmp_path / "weights.msgpack"
    assert itw.main(["--pth", str(pth), "--out", str(out), "--phi", "S0",
                     "--backbone", "en", "--neck", "gdf",
                     "--resolution", "64"]) == 0

    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", resolution=64)
    jm = create_model(cfg)
    variables = itw.load_variables(str(out))

    rng = np.random.RandomState(13)
    img = rng.randn(1, 3, 64, 64).astype(np.float32)
    rad = rng.randn(1, 3, 64, 64).astype(np.float32)
    pc = rng.randn(1, 5, 512).astype(np.float32)
    with torch.no_grad():
        det_t = tm(torch.from_numpy(img), torch.from_numpy(rad),
                   torch.from_numpy(pc))[0]
    det_j = jm.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                     jnp.asarray(rad.transpose(0, 2, 3, 1)),
                     jnp.asarray(pc.transpose(0, 2, 1)))[0]
    for g, w in zip(det_j, det_t):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), rtol=5e-3, atol=5e-4)

    # --partial skips missing keys (reference's filtered load)
    sd = tm.state_dict()
    removed = [k for k in list(sd) if k.startswith("det_head.")]
    for k in removed:
        del sd[k]
    torch.save(sd, str(pth))
    assert itw.main(["--pth", str(pth), "--out", str(out), "--phi", "S0",
                     "--backbone", "en", "--neck", "gdf",
                     "--resolution", "64", "--partial"]) == 0


def test_full_achelous_cdf_forward_parity():
    _assembly_parity("S0", "en", "cdf", seed=11)


def test_full_achelous_rdf_forward_parity():
    _assembly_parity("S0", "mo", "rdf", seed=12)


# ---------------------------------------------------------------------------
# EdgeNeXt backbone
# ---------------------------------------------------------------------------


def _map_conv_encoder(tb):
    return {
        "dwconv": {"kernel": conv_t2j(tb.dwconv.weight),
                   "bias": t2j(tb.dwconv.bias)},
        "norm": ln_t2j(tb.norm),
        "pwconv1": {"kernel": dense_t2j(tb.pwconv1.weight),
                    "bias": t2j(tb.pwconv1.bias)},
        "pwconv2": {"kernel": dense_t2j(tb.pwconv2.weight),
                    "bias": t2j(tb.pwconv2.bias)},
        "gamma": t2j(tb.gamma),
    }


def _map_sdta(tb):
    p = {
        "norm_xca": ln_t2j(tb.norm_xca),
        "gamma_xca": t2j(tb.gamma_xca),
        "norm": ln_t2j(tb.norm),
        "pwconv1": {"kernel": dense_t2j(tb.pwconv1.weight),
                    "bias": t2j(tb.pwconv1.bias)},
        "pwconv2": {"kernel": dense_t2j(tb.pwconv2.weight),
                    "bias": t2j(tb.pwconv2.bias)},
        "gamma": t2j(tb.gamma),
        "xca": {
            "qkv": {"kernel": dense_t2j(tb.xca.qkv.weight),
                    "bias": t2j(tb.xca.qkv.bias)},
            "proj": {"kernel": dense_t2j(tb.xca.proj.weight),
                     "bias": t2j(tb.xca.proj.bias)},
            "temperature": t2j(tb.xca.temperature),
        },
    }
    for i, conv in enumerate(tb.convs):
        p[f"convs_{i}"] = {"kernel": conv_t2j(conv.weight),
                           "bias": t2j(conv.bias)}
    if tb.pos_embd is not None:
        p["pos_embd"] = {"token_projection": {
            "kernel": t2j(tb.pos_embd.token_projection.weight)[:, :, 0, 0].T,
            "bias": t2j(tb.pos_embd.token_projection.bias)}}
    return p


def test_edgenext_forward_parity():
    from backbone.vision.edgenext_modules.model import edgenext_xx_small
    from achelous_tpu.models.edgenext import edgenext_xx_small as jx

    tm = edgenext_xx_small().eval()
    jm = jx()
    x_np = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    params = dict(jax.tree_util.tree_map(np.asarray, variables["params"]))

    # stem + downsample layers
    stem = tm.downsample_layers[0]
    params["stem_conv"] = {"kernel": conv_t2j(stem[0].weight),
                           "bias": t2j(stem[0].bias)}
    params["stem_norm"] = ln_t2j(stem[1])
    for i in range(1, 4):
        ds = tm.downsample_layers[i]
        params[f"down_norm_{i}"] = ln_t2j(ds[0])
        params[f"down_conv_{i}"] = {"kernel": conv_t2j(ds[1].weight),
                                    "bias": t2j(ds[1].bias)}
    # stages
    depths = (2, 2, 6, 2)
    for si in range(4):
        for bi in range(depths[si]):
            tb = tm.stages[si][bi]
            cls = type(tb).__name__
            if cls == "SDTAEncoder":
                params[f"stage{si}_sdta{bi}"] = _map_sdta(tb)
            else:
                params[f"stage{si}_conv{bi}"] = _map_conv_encoder(tb)

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply({"params": params}, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Production-resolution and non-S0-width parity spot checks (VERDICT r2
# missing 2): all other transplant tests run 64^2 / S0; these pin the
# resolution-dependent machinery (EfficientFormer attention-bias tables at
# res 10/20 + stride attention, ref ImageEncoder.py:108-129) and the
# S1/S2 width/expansion tables (ImageEncoder.py:23-60) at 320^2.
# ---------------------------------------------------------------------------


def test_full_achelous_320_parity():
    """EN-GDF-PN-S0 full assembly transplanted at the production 320^2."""
    _assembly_parity("S0", "en", "gdf", seed=21, resolution=320)


def test_efficientformer_s2_320_parity():
    """EfficientFormerV2 S2 width tables at 320^2 (bias tables at
    resolution 10/20, attention-downsample embeddings, stride attention)."""
    from backbone.vision.ImageEncoder import image_encoder_s2
    from achelous_tpu.models.efficientformer import image_encoder_s2 as jx
    from achelous_tpu.utils.torch_import import (efficientformer_mapping,
                                                 transplant)

    tm = image_encoder_s2(resolution=320).eval()
    jm = jx(resolution=320, use_pallas_attention=False)
    x_np = np.random.RandomState(22).randn(1, 3, 320, 320).astype(np.float32)
    variables = jax.jit(jm.init)(jax.random.PRNGKey(0),
                                 jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray, variables), state_dict_np(tm),
        efficientformer_mapping("S2"))

    with torch.no_grad():
        want = [o.numpy() for o in tm(torch.from_numpy(x_np))]
    got = jm.apply(new_vars, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=5e-4)
