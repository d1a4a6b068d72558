"""Pallas TPU kernel for banded modulated deformable-conv sampling.

Computes the same function as ops/deform.py `banded_deform_samples`
(reference conv_utils/dcn.py + torchvision deform_conv2d semantics with
offsets clipped to +-band cells) but VMEM-resident: the XLA scan
formulation re-reads the padded image from HBM for every (tap, dy) step
(~90 full-image passes at band=4 — fetch-forced timing 2026-08-17 put
RCNet-S0 at 95 ms/batch at bs=32), while this kernel keeps each batch
element's image on-chip and only streams offsets/mask in and samples out.

Adaptive banding: the dense shift-window sum costs 9*(2r+1)^2 VPU passes
per pixel, but the bilinear hat weights relu(1-|o-d|) are zero outside a
2-cell support, so an image whose offsets all satisfy |o| <= r_eff can be
computed EXACTLY (zero terms are exact fp no-ops) with the r_eff window
d in [-r_eff, r_eff] — the naive bound's d = r_eff+1 row/column has
weight 1-|o-r_eff-1| <= 0 for every clipped o (exactly 0 at o = r_eff;
float rounding of 1+eps never lands below 1) and is dropped.  The kernel
branches per batch element on max|offset|:

  tier 0  all offsets zero   -> 9 masked shifted copies (the reference's
                                 zero-init regime, dcn.py:29-40)
  tier 1  |o| <= 1           -> 3^2-window dense sum
  tier 2  |o| <= 2           -> 5^2-window dense sum
  tier 3  otherwise          -> full (2*band+1)^2 window

Layout: channels-first inside the kernel (C is as small as 3 in RCNet —
NHWC would occupy 3/128 lanes; [*, H, W] puts W on the lane axis).  The
channels-first entry point `pallas_deform_samples_cf` returns [B, K*C, H,
W] so the caller can run the output projection before transposing back —
the [B, H, W, K*C] samples transpose is 9x the traffic of the projected
[B, Cout, H, W] map.

Gradients: custom_vjp whose backward is the VJP of the (mathematically
identical) XLA banded path, so training works unchanged.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(h: int, w: int) -> int:
    """Largest 16-aligned divisor of h keeping the tile around <=cap px.

    Multi-tile starts i*th must be provably aligned to the sublane tile
    for Mosaic's dynamic loads — 16 rows for bf16 (tile (16, 128)), which
    also covers f32's 8; a single whole-image tile always starts at 0.
    The pixel cap bounds Mosaic's per-kernel stack: unrolled hat/FMA ops
    hold [th, w] f32 temporaries the stack allocator does not fully reuse
    (measured 108 MB scoped vmem at [80, 160] tiles with the original
    kernel body), while whole-image 320^2 blocks also took >35 min of
    codegen.  The default 8k-px cap was sized for that original body; the
    current body (row-wise SSA, hoisted hats, (2r+1)^2 windows) holds
    fewer live temporaries, and a larger cap cuts the per-grid-cell
    overhead (320^2 at 16-row tiles = 640 grid cells/batch) —
    ACHELOUS_DEFORM_TILE_PX overrides for measurement
    (tools/deform_tile_sweep.py)."""
    cap = int(os.environ.get("ACHELOUS_DEFORM_TILE_PX", "8192"))
    target = max(16, cap // max(w, 1))
    if h <= target:
        return h
    best = h
    for th in range(16, h):
        if h % th == 0 and th % 16 == 0 and th <= target:
            best = th
    return best


def _deform_kernel(x_ref, off_ref, mask_ref, out_ref, acc_ref, *,
                   band: int, kh: int, kw: int, th: int, w: int, c: int,
                   pad: int, padding: int, single_tile: bool):
    k = kh * kw
    i = pl.program_id(1)
    row0 = i * th
    # compute in f32 regardless of input dtype: bf16 in-kernel math makes
    # Mosaic's (16,128)-tile relayouts blow the scoped-vmem stack (125 MB
    # at 320^2 vs 34 MB f32), and f32 VPU throughput is the same.
    off = off_ref[0].astype(jnp.float32)              # [2K, TH, W]
    mask = mask_ref[0].astype(jnp.float32)            # [K, TH, W]
    mo = jnp.max(jnp.abs(off))

    # ONE aligned load of the tile's halo slab; every tap/shift below is a
    # STATIC slice of it.  Multi-tile grids use a dynamic start (i*th,
    # provably 16-aligned by _row_tile); a single-tile grid must use a
    # static 0 start — Mosaic cannot prove i*th aligned when th itself is
    # not (e.g. the 20^2 RCNet stage), even though i is always 0.
    if single_tile:
        slab = x_ref[0, :, 0:th + 2 * pad, :].astype(jnp.float32)
    else:
        slab = x_ref[0, :, pl.ds(row0, th + 2 * pad), :].astype(jnp.float32)

    def xs(ty, tx, dy, dx):
        """Slab slice for tap (ty, tx) shifted by (dy, dx)."""
        return slab[:, pad + ty + dy:pad + ty + dy + th,
                    pad + tx + dx:pad + tx + dx + w]

    def dense(r_eff: int):
        # accumulate in a VMEM scratch ref: an SSA value chain of 900
        # unrolled adds makes Mosaic's stack allocator keep every term
        # alive (34 MB scoped-vmem OOM at 320^2); in-place ref updates
        # reuse one buffer.  Within one dy row the (2r+1)-term SSA sum is
        # safe and halves the scratch read/write traffic; the column hats
        # wx depend only on (tap, dx) and are hoisted out of the dy loop.
        for ki in range(k):
            ty, tx = ki // kw - padding, ki % kw - padding
            oy = jnp.clip(off[2 * ki], -band, band)
            ox = jnp.clip(off[2 * ki + 1], -band, band)
            wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ox - dx))
                   for dx in range(-r_eff, r_eff + 1)]
            for dy in range(-r_eff, r_eff + 1):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - dy))
                row = None
                for j, dx in enumerate(range(-r_eff, r_eff + 1)):
                    term = (wy * wxs[j])[None] * xs(ty, tx, dy, dx)
                    row = term if row is None else row + term
                if dy == -r_eff:
                    acc_ref[:] = row
                else:
                    acc_ref[:] = acc_ref[:] + row
            out_ref[0, ki * c:(ki + 1) * c] = (
                acc_ref[:] * mask[ki][None]).astype(out_ref.dtype)

    @pl.when(mo == 0.0)
    def _():
        for ki in range(k):
            ty, tx = ki // kw - padding, ki % kw - padding
            out_ref[0, ki * c:(ki + 1) * c] = (
                xs(ty, tx, 0, 0) * mask[ki][None]).astype(out_ref.dtype)

    tiers = sorted({r for r in (1, 2, band) if r <= band})
    lo = 0.0
    for r_eff in tiers:
        is_last = r_eff == tiers[-1]
        cond = ((mo > lo) & (mo <= r_eff)) if not is_last else (mo > lo)
        pl.when(cond)(functools.partial(dense, r_eff))
        lo = float(r_eff)


def _pallas_deform_cf_impl(xcf, ocf, mcf, band, kh, kw, padding,
                           interpret=False):
    """Channels-first impl: xcf [B,C,H,W], ocf [B,2K,H,W], mcf [B,K,H,W]
    -> samples [B, K*C, H, W] (tap-major)."""
    b, c, h, w = xcf.shape
    k = kh * kw
    r = int(band)
    # halo reach is r+1+tap, rounded up to 8 to keep sublane alignment
    pad = -(-(r + 1 + max(padding, max(kh, kw) // 2)) // 8) * 8
    th = _row_tile(h, w)

    xp = jnp.pad(xcf, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    kernel = functools.partial(_deform_kernel, band=r, kh=kh, kw=kw, th=th,
                               w=w, c=c, pad=pad, padding=padding,
                               single_tile=(th == h))
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, c, h + 2 * pad, w + 2 * pad),
                         lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * k, th, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, th, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * c, th, w),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k * c, h, w), xcf.dtype),
        scratch_shapes=[pltpu.VMEM((c, th, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, ocf, mcf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pallas_deform_samples_cf(x: jnp.ndarray, offset: jnp.ndarray,
                             mask: jnp.ndarray, band: int, kh: int,
                             kw: int, padding: int = 1,
                             interpret: bool = False) -> jnp.ndarray:
    """Banded deformable sampling on TPU via Pallas, channels-first out.

    NHWC args as in ops/deform.py `banded_deform_samples` (x [B,H,W,C],
    offset [B,H,W,2K], mask [B,H,W,K]) but returns [B, K*C, H, W]
    (tap-major) so the output projection can run before the NHWC
    transpose.  Stride-1 only.  interpret=True runs in the Pallas
    interpreter (the CPU equality tests)."""
    return _pallas_deform_cf_impl(
        x.transpose(0, 3, 1, 2), offset.transpose(0, 3, 1, 2),
        mask.transpose(0, 3, 1, 2), band, kh, kw, padding, interpret)


def _cf_fwd(x, offset, mask, band, kh, kw, padding, interpret=False):
    out = pallas_deform_samples_cf(x, offset, mask, band, kh, kw, padding,
                                   interpret)
    return out, (x, offset, mask)


def _cf_bwd(band, kh, kw, padding, interpret, res, g):
    from achelous_tpu.ops.deform import banded_deform_samples
    x, offset, mask = res
    _, pullback = jax.vjp(
        lambda xx, oo, mm: banded_deform_samples(xx, oo, mm, band, kh, kw,
                                                 padding),
        x, offset, mask)
    return pullback(g.transpose(0, 2, 3, 1))


pallas_deform_samples_cf.defvjp(_cf_fwd, _cf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pallas_deform_samples_cfio(xcf: jnp.ndarray, ocf: jnp.ndarray,
                               mcf: jnp.ndarray, band: int, kh: int,
                               kw: int, padding: int = 1,
                               interpret: bool = False) -> jnp.ndarray:
    """Channels-first IN AND OUT variant of `pallas_deform_samples_cf`
    (x [B,C,H,W], offset [B,2K,H,W], mask [B,K,H,W] -> [B,K*C,H,W]) for
    callers that already hold CF tensors — the CF-chained RCNet
    (models/rcnet.py) keeps the whole radar encoder channels-first so no
    NHWC<->CF transposes surround the kernels."""
    return _pallas_deform_cf_impl(xcf, ocf, mcf, band, kh, kw, padding,
                                  interpret)


def _cfio_fwd(xcf, ocf, mcf, band, kh, kw, padding, interpret=False):
    out = pallas_deform_samples_cfio(xcf, ocf, mcf, band, kh, kw, padding,
                                     interpret)
    return out, (xcf, ocf, mcf)


def _cfio_bwd(band, kh, kw, padding, interpret, res, g):
    from achelous_tpu.ops.deform import banded_deform_samples
    xcf, ocf, mcf = res
    _, pullback = jax.vjp(
        lambda xx, oo, mm: banded_deform_samples(xx, oo, mm, band, kh, kw,
                                                 padding),
        xcf.transpose(0, 2, 3, 1), ocf.transpose(0, 2, 3, 1),
        mcf.transpose(0, 2, 3, 1))
    dx, do, dm = pullback(g.transpose(0, 2, 3, 1))
    return (dx.transpose(0, 3, 1, 2), do.transpose(0, 3, 1, 2),
            dm.transpose(0, 3, 1, 2))


pallas_deform_samples_cfio.defvjp(_cfio_fwd, _cfio_bwd)


def pallas_deform_samples(x: jnp.ndarray, offset: jnp.ndarray,
                          mask: jnp.ndarray, band: int, kh: int, kw: int,
                          padding: int = 1,
                          interpret: bool = False) -> jnp.ndarray:
    """NHWC wrapper: returns [B, H, W, K*C] exactly like
    ops/deform.py `banded_deform_samples`."""
    return pallas_deform_samples_cf(x, offset, mask, band, kh, kw, padding,
                                    interpret).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# Fused RadarConv kernel: avg-pool + offset/modulator convs + tiered banded
# sampling + output projection in ONE kernel.
#
# Motivation (TRACE_SUMMARY_BS1.txt, 2026-08-18): at bs=1 the XLA-side
# offset/modulator convs of RCNet block 0 cost ~0.70 ms/iter — their tiny
# channel counts (3 in, 18/9 out at 320^2) force C-minor layouts that run
# the VPU at 7-14% lane occupancy — plus ~0.16 ms avg-pool, ~0.11 ms
# NHWC->CF copies feeding the kernel, and ~0.20 ms relaying the [B,K*C,H,W]
# samples into the projection matmul; at bs=32 the samples relayout alone
# is 5.8 ms/iter of 42 ms.  Inside the kernel all of these become
# full-lane [*, W]-plane FMAs on the already-resident VMEM slab, and the
# kernel's HBM traffic drops from (pooled in + offsets in + mask in +
# K*C samples out) to (raw in + Cout out).
#
# The composition it replaces (reference RadarEncoder.py:23-41 "pool"
# first_calculator + conv_utils/dcn.py:6-64): pooled = avgpool3x3(x);
# off = conv3x3(pooled); mask = 2*sigmoid(conv3x3(pooled));
# y = deform_conv2d(pooled, off, mask, weight) — see ops/deform.py
# `fused_radarconv_reference`, which is also this op's backward (custom_vjp
# recompute, same pattern as pallas_deform_samples_cf).
# ---------------------------------------------------------------------------


def _fused_kernel(x_ref, wo_ref, bo_ref, wm_ref, bm_ref, wp_ref, out_ref,
                  off_ref, mask_ref, acc_ref, proj_ref, *,
                  band: int, kh: int, kw: int, th: int, h: int, w: int,
                  c: int, cout: int, pr: int, padding: int,
                  single_tile: bool):
    k = kh * kw
    i = pl.program_id(1)
    row0 = i * th
    q = pr - 1                      # pooled-slab halo (pool eats one ring)

    # ONE aligned load of the raw tile + halo; f32 compute throughout (see
    # _deform_kernel's dtype note).
    if single_tile:
        slab = x_ref[0, :, 0:th + 2 * pr, :].astype(jnp.float32)
    else:
        slab = x_ref[0, :, pl.ds(row0, th + 2 * pr), :].astype(jnp.float32)

    # 3x3 stride-1 avg-pool (count_include_pad, torch AvgPool2d semantics)
    # over the halo too, then zero everything outside the true image: the
    # unfused path pools INSIDE the image and zero-pads the pooled map, so
    # pooled values beyond the boundary must read exactly 0 (trained nets
    # drive taps out-of-image to drop them — OFFSET_DISTRIBUTION.json).
    pooled = None
    for dy in range(3):
        for dx in range(3):
            t = slab[:, dy:dy + th + 2 * q, dx:dx + w + 2 * q]
            pooled = t if pooled is None else pooled + t
    pooled = pooled * (1.0 / 9.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * q, w + 2 * q), 0) \
        + (row0 - q)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * q, w + 2 * q), 1) - q
    valid = ((rows >= 0) & (rows < h) & (cols >= 0) & (cols < w))
    pooled = pooled * valid.astype(jnp.float32)[None]

    def cplane(w_sref, b_sref, o):
        """Conv3x3-SAME output channel `o` over the [th, w] tile: full-lane
        shifted-plane FMAs with scalar weights from SMEM."""
        acc = None
        for ky in range(kh):
            for kx in range(kw):
                for ci in range(c):
                    wv = w_sref[(ky * kw + kx) * c + ci, o]
                    t = wv * pooled[ci,
                                    q - padding + ky:q - padding + ky + th,
                                    q - padding + kx:q - padding + kx + w]
                    acc = t if acc is None else acc + t
        return acc + b_sref[o]

    for o in range(2 * k):
        off_ref[o] = cplane(wo_ref, bo_ref, o)
    for o in range(k):
        mask_ref[o] = 2.0 * jax.nn.sigmoid(cplane(wm_ref, bm_ref, o))
    mo = jnp.max(jnp.abs(off_ref[:]))

    def xs(ty, tx, dy, dx):
        return pooled[:, q + ty + dy:q + ty + dy + th,
                      q + tx + dx:q + tx + dx + w]

    def project(ki):
        """proj += wproj[ki*c + ci, co] * acc — the [K*C, Cout] output
        projection folded in, so only Cout planes ever leave the kernel."""
        for co in range(cout):
            s = None
            for ci in range(c):
                t = wp_ref[ki * c + ci, co] * acc_ref[ci]
                s = t if s is None else s + t
            if ki == 0:
                proj_ref[co] = s
            else:
                proj_ref[co] = proj_ref[co] + s

    @pl.when(mo == 0.0)
    def _():
        for ki in range(k):
            ty, tx = ki // kw - padding, ki % kw - padding
            acc_ref[:] = xs(ty, tx, 0, 0) * mask_ref[ki][None]
            project(ki)
        out_ref[0] = proj_ref[:].astype(out_ref.dtype)

    def dense(r_eff: int):
        for ki in range(k):
            ty, tx = ki // kw - padding, ki % kw - padding
            oy = jnp.clip(off_ref[2 * ki], -band, band)
            ox = jnp.clip(off_ref[2 * ki + 1], -band, band)
            wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ox - dx))
                   for dx in range(-r_eff, r_eff + 1)]
            for dy in range(-r_eff, r_eff + 1):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - dy))
                row = None
                for j, dx in enumerate(range(-r_eff, r_eff + 1)):
                    term = (wy * wxs[j])[None] * xs(ty, tx, dy, dx)
                    row = term if row is None else row + term
                if dy == -r_eff:
                    acc_ref[:] = row
                else:
                    acc_ref[:] = acc_ref[:] + row
            acc_ref[:] = acc_ref[:] * mask_ref[ki][None]
            project(ki)
        out_ref[0] = proj_ref[:].astype(out_ref.dtype)

    tiers = sorted({r for r in (1, 2, band) if r <= band})
    lo = 0.0
    for r_eff in tiers:
        is_last = r_eff == tiers[-1]
        cond = ((mo > lo) & (mo <= r_eff)) if not is_last else (mo > lo)
        pl.when(cond)(functools.partial(dense, r_eff))
        lo = float(r_eff)


def _fused_impl(xcf, ok, ob, mk, mb, wp, band, kh, kw, padding,
                interpret=False):
    """xcf [B,C,H,W] raw (un-pooled); ok/mk [kh,kw,C,2K|K] conv kernels;
    wp [kh*kw*C, Cout] projection -> [B, Cout, H, W]."""
    b, c, h, w = xcf.shape
    k = kh * kw
    r = int(band)
    cout = wp.shape[-1]
    # sampling halo as in _pallas_deform_cf_impl, + 1 ring for the pool,
    # rounded to 8 for sublane alignment
    ps = -(-(r + 1 + max(padding, max(kh, kw) // 2)) // 8) * 8
    pr = ps + 8
    th = _row_tile(h, w)

    f32 = jnp.float32
    xp = jnp.pad(xcf, ((0, 0), (0, 0), (pr, pr), (pr, pr)))
    kernel = functools.partial(
        _fused_kernel, band=r, kh=kh, kw=kw, th=th, h=h, w=w, c=c,
        cout=cout, pr=pr, padding=padding, single_tile=(th == h))
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, c, h + 2 * pr, w + 2 * pr),
                         lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            smem((k * c, 2 * k), lambda bi, i: (0, 0)),
            smem((2 * k,), lambda bi, i: (0,)),
            smem((k * c, k), lambda bi, i: (0, 0)),
            smem((k,), lambda bi, i: (0,)),
            smem((k * c, cout), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cout, th, w), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, h, w), xcf.dtype),
        scratch_shapes=[pltpu.VMEM((2 * k, th, w), f32),
                        pltpu.VMEM((k, th, w), f32),
                        pltpu.VMEM((c, th, w), f32),
                        pltpu.VMEM((cout, th, w), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, ok.reshape(k * c, 2 * k).astype(f32), ob.astype(f32),
      mk.reshape(k * c, k).astype(f32), mb.astype(f32), wp.astype(f32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def pallas_fused_radarconv(x: jnp.ndarray, ok: jnp.ndarray, ob: jnp.ndarray,
                           mk: jnp.ndarray, mb: jnp.ndarray,
                           wproj: jnp.ndarray, band: int, kh: int, kw: int,
                           padding: int = 1, interpret: bool = False,
                           cf: bool = False) -> jnp.ndarray:
    """Fused RadarConv (pool + offset/modulator convs + banded deformable
    sampling + projection) on TPU via Pallas.

    Args mirror ops/deform.py `fused_radarconv_reference`: x [B,H,W,C] RAW
    (the kernel pools it), ok/ob and mk/mb the offset/modulator conv
    kernels [kh,kw,C,2K]/[2K] and [kh,kw,C,K]/[K], wproj the deform weight
    [kh,kw,C,Cout].  Returns [B, H, W, Cout].  Stride-1 only.

    With cf=True, x is [B,C,H,W] and the result [B,Cout,H,W] — the kernel
    is channels-first internally, so this just skips the boundary
    transposes (the CF-chained RCNet keeps the whole radar encoder CF).
    """
    k = kh * kw
    cout = wproj.shape[-1]
    c = x.shape[1] if cf else x.shape[-1]
    xcf = x if cf else x.transpose(0, 3, 1, 2)
    out_cf = _fused_impl(xcf, ok, ob, mk, mb, wproj.reshape(k * c, cout),
                         band, kh, kw, padding, interpret)
    return out_cf if cf else out_cf.transpose(0, 2, 3, 1)


def _fused_fwd(x, ok, ob, mk, mb, wproj, band, kh, kw, padding,
               interpret=False, cf=False):
    out = pallas_fused_radarconv(x, ok, ob, mk, mb, wproj, band, kh, kw,
                                 padding, interpret, cf)
    return out, (x, ok, ob, mk, mb, wproj)


def _fused_bwd(band, kh, kw, padding, interpret, cf, res, g):
    from achelous_tpu.ops.deform import fused_radarconv_reference
    x, ok, ob, mk, mb, wproj = res
    xn = x.transpose(0, 2, 3, 1) if cf else x
    _, pullback = jax.vjp(
        lambda *a: fused_radarconv_reference(*a, band, kh, kw, padding),
        xn, ok, ob, mk, mb, wproj)
    dx, dok, dob, dmk, dmb, dwp = pullback(
        g.transpose(0, 2, 3, 1) if cf else g)
    if cf:
        dx = dx.transpose(0, 3, 1, 2)
    return dx, dok, dob, dmk, dmb, dwp


pallas_fused_radarconv.defvjp(_fused_fwd, _fused_bwd)
