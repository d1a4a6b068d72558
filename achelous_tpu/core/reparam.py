"""Deploy-time reparameterization as pure pytree->pytree transforms.

The reference mutates modules in place (RepVGGBlock.switch_to_deploy
repvgg_conv.py:150-165, MobileOneBlock.reparameterize mobileone.py:155-183,
RepVGGDW.fuse repvit.py:100-120, RepMixer.reparameterize fastvit.py:292-347,
ReparamLargeKernelConv.fuse replknet.py, RepCPE.reparameterize
fastvit.py:497-519).  Here the train-form {params, batch_stats} tree is folded
into the parameter tree of the same module built with `deploy=True` — a pure
function, after which XLA compiles the single-branch model.

Invariant (tested): deploy-model output == eval-mode train-model output to
fp32 tolerance.

Flax conv kernels are [kh, kw, cin/groups, cout]; BN fold scales the kernel's
last axis.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


def _fuse_conv_bn(kernel: jnp.ndarray, bn_p: Dict, bn_s: Dict,
                  eps: float = BN_EPS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold BatchNorm(params bn_p, stats bn_s) into the preceding conv."""
    gamma = bn_p["scale"]
    beta = bn_p["bias"]
    mean = bn_s["mean"]
    var = bn_s["var"]
    t = gamma / jnp.sqrt(var + eps)
    return kernel * t, beta - mean * t


def _bn_identity_kernel(c: int, groups: int, k: int) -> jnp.ndarray:
    """Identity conv kernel [k, k, c/groups, c] (repvgg_conv.py:134-139)."""
    in_dim = c // groups
    kern = np.zeros((k, k, in_dim, c), np.float32)
    for i in range(c):
        kern[k // 2, k // 2, i % in_dim, i] = 1.0
    return jnp.asarray(kern)


def _fuse_bn_only(c: int, groups: int, k: int, bn_p: Dict, bn_s: Dict
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """A bare BN branch as an equivalent k x k conv."""
    return _fuse_conv_bn(_bn_identity_kernel(c, groups, k), bn_p, bn_s)


def _pad_kernel(kernel: jnp.ndarray, k: int) -> jnp.ndarray:
    """Zero-pad a small conv kernel to k x k (centered)."""
    kh = kernel.shape[0]
    p = (k - kh) // 2
    return jnp.pad(kernel, ((p, p), (p, p), (0, 0), (0, 0)))


def fold_repvgg(p: Dict, s: Dict) -> Dict:
    """RepVGGBlock -> {'rbr_reparam': {kernel, bias}} (repvgg_conv.py:110-148)."""
    k3, b3 = _fuse_conv_bn(p["rbr_dense_conv"]["kernel"], p["rbr_dense_bn"],
                           s["rbr_dense_bn"])
    k1, b1 = _fuse_conv_bn(p["rbr_1x1_conv"]["kernel"], p["rbr_1x1_bn"],
                           s["rbr_1x1_bn"])
    kernel = k3 + _pad_kernel(k1, 3)
    bias = b3 + b1
    if "rbr_identity" in p:
        cin_g, cout = k3.shape[2], k3.shape[3]
        kid, bid = _fuse_bn_only(cout, cout // cin_g, 3, p["rbr_identity"],
                                 s["rbr_identity"])
        kernel = kernel + kid
        bias = bias + bid
    return {"rbr_reparam": {"kernel": kernel, "bias": bias}}


def fold_mobileone(p: Dict, s: Dict, k_default: int = 3) -> Dict:
    """MobileOneBlock -> {'reparam_conv': ...} (mobileone.py:155-221).

    Keeps any non-reparam submodules (se) untouched.  `k_default` is the
    kernel size when the block has neither conv nor scale branches (the
    RepMixer 'norm' block: BN-only, fastvit.py:292-307).
    """
    conv_keys = sorted(k for k in p if k.startswith("rbr_conv_") and
                       k.endswith("_conv"))
    k_full = k_default
    kernel = 0.0
    bias = 0.0
    if not conv_keys and "rbr_scale_conv" not in p:
        # BN-only block: identity conv fused with the skip BN
        c = p["rbr_skip"]["scale"].shape[0]
        kid, bid = _fuse_bn_only(c, c, k_full, p["rbr_skip"], s["rbr_skip"])
        return {"reparam_conv": {"kernel": kid, "bias": bid}}
    for ck in conv_keys:
        bn = ck[:-5] + "_bn"
        kk, bb = _fuse_conv_bn(p[ck]["kernel"], p[bn], s[bn])
        kernel = kernel + kk
        bias = bias + bb
        k_full = kk.shape[0]
    if "rbr_scale_conv" in p:
        ks, bs_ = _fuse_conv_bn(p["rbr_scale_conv"]["kernel"],
                                p["rbr_scale_bn"], s["rbr_scale_bn"])
        kernel = kernel + _pad_kernel(ks, k_full)
        bias = bias + bs_
    if "rbr_skip" in p:
        if conv_keys:
            cin_g, cout = p[conv_keys[0]]["kernel"].shape[2:4]
        else:
            cin_g, cout = p["rbr_scale_conv"]["kernel"].shape[2:4]
        kid, bid = _fuse_bn_only(cout, cout // cin_g, k_full, p["rbr_skip"],
                                 s["rbr_skip"])
        kernel = kernel + kid
        bias = bias + bid
    out = {"reparam_conv": {"kernel": kernel, "bias": bias}}
    if "se" in p:
        out["se"] = p["se"]
    return out


def fold_repvggdw(p: Dict, s: Dict) -> Dict:
    """repvit RepVGGDW -> single depthwise 3x3 (repvit.py:100-120)."""
    k3, b3 = _fuse_conv_bn(p["conv_c"]["kernel"], p["conv_bn"], s["conv_bn"])
    k1, b1 = _fuse_conv_bn(p["conv1_c"]["kernel"], p["conv1_bn"], s["conv1_bn"])
    c = k3.shape[-1]
    kid = _bn_identity_kernel(c, c, 3)
    return {"reparam_conv": {"kernel": k3 + _pad_kernel(k1, 3) + kid,
                             "bias": b3 + b1}}


def fold_repmixer(p: Dict, s: Dict) -> Dict:
    """fastvit RepMixer -> single depthwise conv (fastvit.py:292-347).

    w = id + layer_scale * (mixer_w - norm_w); b = layer_scale*(mb - nb).
    """
    mixer = fold_mobileone(p["mixer"], s["mixer"])["reparam_conv"]
    norm = fold_mobileone(p["norm"], s["norm"])["reparam_conv"]
    ls = p["layer_scale"]
    c = mixer["kernel"].shape[-1]
    k = mixer["kernel"].shape[0]
    kid = _bn_identity_kernel(c, c, k)
    kernel = kid + ls[None, None, None, :] * (mixer["kernel"] - norm["kernel"])
    bias = ls * (mixer["bias"] - norm["bias"])
    return {"reparam_conv": {"kernel": kernel, "bias": bias}}


def fold_replk(p: Dict, s: Dict) -> Dict:
    """ReparamLargeKernelConv -> single large conv (replknet.py fuse)."""
    kb, bb = _fuse_conv_bn(p["lkb_origin_conv"]["kernel"], p["lkb_origin_bn"],
                           s["lkb_origin_bn"])
    ks, bs_ = _fuse_conv_bn(p["small_conv"]["kernel"], p["small_bn"],
                            s["small_bn"])
    k = kb.shape[0]
    return {"lkb_reparam": {"kernel": kb + _pad_kernel(ks, k),
                            "bias": bb + bs_}}


def fold_repcpe(p: Dict, s: Dict) -> Dict:
    """RepCPE -> pe + depthwise identity (fastvit.py:497-519)."""
    del s
    kern = p["pe"]["kernel"]
    c = kern.shape[-1]
    kid = _bn_identity_kernel(c, c, kern.shape[0])
    return {"reparam_conv": {"kernel": kern + kid, "bias": p["pe"]["bias"]}}


def _is_leaf_module(d: Dict) -> str | None:
    keys = set(d.keys())
    if "rbr_dense_conv" in keys:
        return "repvgg"
    if {"conv_c", "conv_bn", "conv1_c", "conv1_bn"} == keys:
        return "repvggdw"
    if "mixer" in keys and "norm" in keys and "layer_scale" in keys and \
            isinstance(d["mixer"], dict) and "rbr_conv_0_conv" in d["mixer"]:
        return "repmixer"
    if "lkb_origin_conv" in keys:
        return "replk"
    if any(k.startswith("rbr_conv_") for k in keys) or "rbr_scale_conv" in keys:
        return "mobileone"
    if keys == {"pe"} and isinstance(d["pe"], dict) and "kernel" in d["pe"]:
        return "repcpe"
    return None


_FOLDERS = {"repvgg": fold_repvgg, "repvggdw": fold_repvggdw,
            "repmixer": fold_repmixer, "replk": fold_replk,
            "mobileone": fold_mobileone, "repcpe": fold_repcpe}


def reparameterize(variables: Dict) -> Dict:
    """Fold every reparameterizable module in a variables tree.

    Returns {'params': deploy_params, 'batch_stats': remaining_stats} for use
    with the same model constructed with deploy=True.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: Dict, s: Dict):
        kind = _is_leaf_module(p)
        if kind is not None:
            return _FOLDERS[kind](p, s), None
        new_p, new_s = {}, {}
        for k, v in p.items():
            if isinstance(v, dict):
                sub_s = s.get(k, {}) if isinstance(s, dict) else {}
                np_, ns_ = walk(v, sub_s)
                new_p[k] = np_
                if ns_:
                    new_s[k] = ns_
            else:
                new_p[k] = v
        # keep stats of non-folded BNs
        if isinstance(s, dict):
            for k, v in s.items():
                if k not in new_s and k in new_p and isinstance(v, dict) and \
                        "mean" in v:
                    new_s[k] = v
        return new_p, (new_s or None)

    new_params, new_stats = walk(params, stats)
    out = {"params": new_params}
    if new_stats:
        out["batch_stats"] = new_stats
    return out
