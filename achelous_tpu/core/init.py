"""Reference-parity weight initialization as a pure pytree transform.

Ports `weights_init` (reference loss/detection_loss.py:466-485, applied
unconditionally at train.py:342): every module whose torch classname contains
'Conv' gets its weight re-drawn by one of four schemes (normal / xavier /
kaiming / orthogonal, all with the SAME `init_gain`, default 0.02), and every
BatchNorm2d gets scale ~ N(1.0, 0.02), bias = 0.  Linear layers and biases
are untouched.

Torch operates by in-place module mutation; here the same effect is a pure
params -> params function:

  * conv weights are `kernel` leaves with ndim >= 3 (flax HWIO / LIO layout;
    a flax Dense kernel is 2-D and is deliberately left alone, matching the
    reference's classname filter which excludes nn.Linear);
  * BatchNorm modules are identified EXACTLY by their path in the
    `batch_stats` collection (only BN owns running mean/var), so LayerNorm /
    GroupNorm scales are never touched — same as the torch classname match.

Deliberate deviations (see ARCHITECTURE.md):
  * the reference only re-draws BatchNorm**2d**; the point-cloud branch's
    BatchNorm1d keeps torch's default scale=1.  Here every BN is re-drawn
    N(1, 0.02) — the flax tree does not distinguish 1d/2d BN (both store a
    [C] scale), and the 0.02-std difference on the pc branch is immaterial.
  * torch conv biases keep their construction-time uniform init; flax conv
    biases are zeros.  `weights_init` touches neither (the reference's
    init_func only sets `.weight`).
"""
from __future__ import annotations

from typing import Any, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INIT_TYPES = ("normal", "xavier", "kaiming", "orthogonal")


def _bn_paths(batch_stats: Any) -> Set[Tuple[str, ...]]:
    """Module paths that own running statistics — i.e. every BatchNorm."""
    paths = set()
    if not batch_stats:
        return paths
    flat = jax.tree_util.tree_flatten_with_path(batch_stats)[0]
    for kp, _ in flat:
        names = tuple(k.key for k in kp)
        if names and names[-1] in ("mean", "var"):
            paths.add(names[:-1])
    return paths


def _conv_init(rng, shape, dtype, init_type: str, gain: float) -> jnp.ndarray:
    """One conv kernel (flax layout [*spatial, in, out]); fan_in =
    prod(shape[:-1]) matches torch's in*kh*kw on its [out,in,kh,kw] layout."""
    if init_type == "normal":
        return gain * jax.random.normal(rng, shape, dtype)
    if init_type == "xavier":
        # torch xavier_normal_(gain): std = gain * sqrt(2 / (fan_in+fan_out))
        fan_in = int(np.prod(shape[:-1]))
        recep = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        fan_out = shape[-1] * recep
        std = gain * float(np.sqrt(2.0 / (fan_in + fan_out)))
        return std * jax.random.normal(rng, shape, dtype)
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2 / fan_in)
        fan_in = int(np.prod(shape[:-1]))
        std = float(np.sqrt(2.0 / fan_in))
        return std * jax.random.normal(rng, shape, dtype)
    if init_type == "orthogonal":
        return jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)(
            rng, shape, dtype)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented")


def weights_init(params: Any, batch_stats: Any, rng,
                 init_type: str = "normal", init_gain: float = 0.02) -> Any:
    """Pure re-initialization of a flax param tree (reference
    detection_loss.py:466-485 semantics; see module docstring)."""
    if init_type not in INIT_TYPES:
        raise NotImplementedError(
            f"initialization method [{init_type}] is not implemented")
    bn = _bn_paths(batch_stats)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for i, (kp, leaf) in enumerate(flat):
        names = tuple(k.key for k in kp)
        sub = jax.random.fold_in(rng, i)
        if names[-1] == "kernel" and leaf.ndim >= 3:
            out.append(_conv_init(sub, leaf.shape, leaf.dtype,
                                  init_type, init_gain))
        elif names[:-1] in bn and names[-1] == "scale":
            out.append(1.0 + 0.02 * jax.random.normal(sub, leaf.shape,
                                                      leaf.dtype))
        elif names[:-1] in bn and names[-1] == "bias":
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
