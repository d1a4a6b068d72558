"""Functional EMA of the full variable pytree (params + batch_stats).

reference loss/detection_loss.py:433-463 (ModelEMA): decay ramps as
d = decay * (1 - exp(-updates / tau)); every float leaf of the state dict is
averaged.  Here it is a pure pytree -> pytree update.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_tree, new_tree, updates: jnp.ndarray,
               decay: float = 0.9999, tau: float = 2000.0):
    """One EMA step; `updates` is the post-increment update counter."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))

    def upd(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + (1.0 - d) * p.astype(e.dtype)
        return p

    return jax.tree_util.tree_map(upd, ema_tree, new_tree)
