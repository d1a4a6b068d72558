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
