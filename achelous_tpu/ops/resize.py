"""Bilinear resize as two MXU matmuls.

The reference upsamples with `nn.Upsample(mode='bilinear', align_corners=True)`
(reference neck/ghostdualfpn.py:34).  On TPU the idiomatic formulation of a
static-shape separable resize is a pair of small dense interpolation matrices
contracted against the H and W axes — XLA maps these straight onto the MXU and
fuses them with the surrounding convs, which beats a gather-based resize by a
wide margin at these sizes (<=320).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Dense [n_out, n_in] linear-interpolation matrix (float32)."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    out = np.arange(n_out, dtype=np.float64)
    if align_corners:
        src = out * (n_in - 1) / (n_out - 1)
    else:
        src = np.clip((out + 0.5) * n_in / n_out - 0.5, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = src - lo
    m = np.zeros((n_out, n_in), dtype=np.float64)
    m[np.arange(n_out), lo] = 1.0 - frac
    m[np.arange(n_out), lo + 1] = frac
    return m.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = True) -> jnp.ndarray:
    """Bilinear-resize an NHWC tensor to `out_hw` via separable matmuls."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(_interp_matrix(h, oh, align_corners), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(w, ow, align_corners), dtype=x.dtype)
    # [oh,h] x [b,h,w,c] -> [b,oh,w,c]
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    # [ow,w] x [b,oh,w,c] -> [b,oh,ow,c]
    x = jnp.einsum("pw,bowc->bopc", mw, x)
    return x


def upsample2x(x: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    b, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners)
