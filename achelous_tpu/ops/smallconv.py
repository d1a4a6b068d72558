"""Small-channel convolutions as unrolled elementwise FMA chains.

At bs=1, XLA's TPU layout assignment brackets tiny-channel convolutions in
relayout copies that cost several times the convolution itself (r5 flagship
trace, TRACE_SUMMARY_BS1.txt): RCNet's channels-first 1x1 weight conv at
cin=3/320^2 — 1.8 MFLOPs — took 0.36 ms/frame as conv+copies (~2% of HBM
bandwidth), and the seg decoders' full-res GhostModule convs paid two
0.1 ms/frame input relayouts plus 7-tap "convolution fusion" lowerings of
trivial depthwise 3x3s.  With so few channels the MXU is idle regardless,
so these convs are reformulated as an unrolled sum of broadcast multiplies:
pure VPU work that XLA fuses into the producer/consumer in whatever layout
they already carry — no copies, no layout churn, no custom-call boundary.

Numerics contract (same as XLA's TPU convolution): products are formed in
f32 — a bf16 x bf16 product is exact in f32 — and accumulated in f32,
rounding to the compute dtype once at the end.  Only the summation order
differs from the MXU reduction tree, so results match the nn.Conv path to
float-order tolerance (the 2e-5 contract of tests/test_rcnet_cf.py) and are
bit-identical at bf16 output precision in almost all lanes.

Every entry point falls back to lax.conv_general_dilated above the channel
caps (env-tunable; defaults from the r5 A/B, tools/cfconv_ab.py), so wide
layers keep the MXU path.

Replaces nothing in the reference (pure performance reformulation); the
modules routed through here cite their own reference lines (models/rcnet.py,
ops/primitives.py GhostModule <- backbone/conv_utils/ghost_conv.py:6-29).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def fma_enabled() -> bool:
    return os.environ.get("ACHELOUS_SMALLCONV_FMA", "1") != "0"


def cf_fma_ok(cin: int) -> bool:
    """Unrolled-FMA gate for channels-first convs (RCNet weight/offset/
    modulator convs): cin <= cap keeps the unroll length k*k*cin bounded."""
    cap = int(os.environ.get("ACHELOUS_SMALLCONV_FMA_MAX_CIN", "16"))
    return fma_enabled() and cin <= cap


def dw_fma_ok(cout: int) -> bool:
    """Gate for NHWC depthwise convs (GhostModule cheap_conv)."""
    cap = int(os.environ.get("ACHELOUS_SMALLCONV_FMA_MAX_DW", "32"))
    return fma_enabled() and cout <= cap


def conv_cf_fma(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray | None, stride: int, padding: int,
                out_dtype) -> jnp.ndarray:
    """Channels-first conv as kh*kw*cin broadcast FMAs.

    x [B,C,H,W], kernel [kh,kw,cin,cout] (nn.Conv HWIO layout), bias [cout]
    or None.  Returns [B,cout,Ho,Wo] in `out_dtype`.
    """
    kh, kw, cin, cout = kernel.shape
    b, c, h, w = x.shape
    assert c == cin, (c, cin)
    xf = x.astype(jnp.float32)
    wf = kernel.astype(jnp.float32)
    if padding:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (padding, padding),
                          (padding, padding)))
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sh = jax.lax.slice(
                xf, (0, 0, dy, dx),
                (b, cin, dy + (ho - 1) * stride + 1,
                 dx + (wo - 1) * stride + 1),
                (1, 1, stride, stride))                    # [B,cin,Ho,Wo]
            for ci in range(cin):
                t = sh[:, ci][:, None] * wf[dy, dx, ci][None, :, None, None]
                acc = t if acc is None else acc + t
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)[None, :, None, None]
    return acc.astype(out_dtype)


def dwconv_nhwc_fma(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray | None, out_dtype) -> jnp.ndarray:
    """NHWC depthwise/grouped conv (groups == cin) as kh*kw shift-FMAs.

    x [B,H,W,C], kernel [kh,kw,1,cout] with cout = C*m (flax grouped-conv
    layout: output channel o reads input channel o//m); stride 1, SAME
    padding — the GhostModule cheap_conv contract.  Returns [B,H,W,cout].
    """
    kh, kw, _, cout = kernel.shape
    b, h, w, c = x.shape
    m = cout // c
    assert cout == c * m, (cout, c)
    xf = x.astype(jnp.float32)
    if m > 1:
        xf = jnp.repeat(xf, m, axis=-1)
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(xf, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    wf = kernel.astype(jnp.float32)
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sh = jax.lax.slice(xp, (0, dy, dx, 0),
                               (b, dy + h, dx + w, cout))
            t = sh * wf[dy, dx, 0][None, None, None, :]
            acc = t if acc is None else acc + t
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(out_dtype)
