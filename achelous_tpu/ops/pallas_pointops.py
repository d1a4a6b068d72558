"""Pallas TPU kernel: farthest point sampling in one kernel invocation.

FPS is sequentially dependent by definition (each center depends on the
previous min-distance field), so the XLA formulation (ops/pointops.py) is an
`npoint`-step device loop whose per-step work is tiny — at radar scale
(N=512, npoint=128) the loop is overhead-bound, costing ~0.5 ms of the
EN-*-PN2 bs=1 latency.  Here the ENTIRE loop runs inside one Pallas kernel
with xyz resident in VMEM ([8, N] fp32 = 16 KB): the per-step work is a
one-hot gather, an [8, N] distance update and a min-index argmax — all VPU
lane ops with zero inter-step dispatch.

Exact-equality contract with pointops.farthest_point_sample (start at point
0, first-max argmax tie-break, valid-mask semantics) — pinned by
tests/test_pallas_pointops.py in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x: int, m: int = 128) -> int:
    return -(-x // m) * m


def _fps_kernel(xyz_ref, mask_ref, idx_ref, *, npoint: int, n: int):
    xyz = xyz_ref[...].astype(jnp.float32)            # [8, Npad] (3 real rows)
    mask = mask_ref[...].astype(jnp.float32)          # [1, Npad]
    iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    p = idx_ref.shape[-1]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    dist0 = jnp.where(mask > 0, jnp.float32(1e10), jnp.float32(-1.0))

    def body(i, carry):
        dist, far, idxs = carry
        onehot = (iota == far).astype(jnp.float32)     # [1, Npad]
        c = jnp.sum(xyz * onehot, axis=1, keepdims=True)          # [8, 1]
        d = jnp.sum((xyz - c) ** 2, axis=0, keepdims=True)        # [1, Npad]
        dist = jnp.where(mask > 0, jnp.minimum(dist, d),
                         jnp.float32(-1.0))
        idxs = jnp.where(iota_p == i, far, idxs)
        # argmax with FIRST-max tie-break (XLA argmax semantics)
        m = jnp.max(dist)
        far = jnp.min(jnp.where(dist == m, iota, jnp.int32(n)))
        return dist, far, idxs

    _, _, idxs = jax.lax.fori_loop(
        0, npoint, body,
        (dist0, jnp.int32(0), jnp.zeros((1, p), jnp.int32)))
    idx_ref[...] = idxs


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def pallas_farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                                 valid: jnp.ndarray | None = None,
                                 interpret: bool = False) -> jnp.ndarray:
    """FPS indices [B, npoint] over xyz [B, N, 3]; drop-in for
    pointops.farthest_point_sample."""
    b, n, _ = xyz.shape
    npad, ppad = _rup(n), _rup(npoint)
    # [B, 8, Npad]: coordinate rows padded with zeros (contribute 0 to
    # distances), point columns padded as INVALID via the mask
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 8 - 3), (0, npad - n)))
    m = jnp.ones((b, n), jnp.float32) if valid is None else \
        valid.astype(jnp.float32)
    m = jnp.pad(m, ((0, 0), (0, npad - n)))[:, None, :]     # [B, 1, Npad]

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=n)

    def lead(shape):
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        lambda xr, mr, ir: kernel(xr.at[0], mr.at[0], ir.at[0]),
        grid=(b,),
        in_specs=[lead((1, 8, npad)), lead((1, 1, npad))],
        out_specs=lead((1, 1, ppad)),
        out_shape=jax.ShapeDtypeStruct((b, 1, ppad), jnp.int32),
        interpret=interpret,
    )(xyz_t, m)
    return out[:, 0, :npoint]
