"""Multi-task loss weighting: homoscedastic uncertainty + gradient surgery.

reference loss/multitaskloss.py:6-28 (HUncertainty), loss/mgda.py:9-137
(MGDA min-norm Frank-Wolfe), loss/CAGrad.py:11-70 (conflict-averse grad).

The reference instantiates HUncertainty FRESH EVERY STEP
(utils/utils_fit.py:99,145) so its log_vars never train and it degenerates to
unit weights.  Here log_vars are persistent trainable parameters; with the
reference's raw formula sum(exp(-s_i) * L_i) persistent vars would diverge to
+inf, so the Kendall regularizer `+ s_i/2` is included (toggle
`regularize=False` + frozen vars to reproduce the reference exactly).

MGDA/CAGrad are pure-JAX solvers over the task-gradient Gram matrix — the
scipy/Frank-Wolfe loops become fixed-iteration projected-gradient descent on
the (tiny, task_num <= 4) simplex, fully jittable.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def uncertainty_weighted(losses: Sequence[jnp.ndarray], log_vars: jnp.ndarray,
                         regularize: bool = True) -> jnp.ndarray:
    """sum_i exp(-s_i) * L_i (+ s_i / 2)."""
    stacked = jnp.stack(list(losses))
    total = jnp.sum(jnp.exp(-log_vars) * stacked)
    if regularize:
        total = total + 0.5 * jnp.sum(log_vars)
    return total


def _project_simplex(v: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection onto the probability simplex (sorted-threshold)."""
    n = v.shape[0]
    u = jnp.sort(v)[::-1]
    css = jnp.cumsum(u)
    rho_mask = u + (1.0 - css) / jnp.arange(1, n + 1) > 0
    rho = jnp.sum(rho_mask.astype(jnp.int32))
    lam = (1.0 - css[rho - 1]) / rho
    return jnp.maximum(v + lam, 0.0)


def minnorm_weights(gram: jnp.ndarray, iters: int = 50,
                    lr: float = 0.5) -> jnp.ndarray:
    """Min-norm element of the convex hull of task gradients.

    Solves min_w w^T G w over the simplex (the MGDA subproblem,
    reference loss/mgda.py:23-109) by projected gradient descent — exact
    enough at task_num <= 4 and fully branch-free for XLA.
    """
    t = gram.shape[0]
    w = jnp.full((t,), 1.0 / t, gram.dtype)

    def body(i, w):
        grad = 2.0 * gram @ w
        return _project_simplex(w - lr * grad / (jnp.linalg.norm(grad) + 1e-12))

    return jax.lax.fori_loop(0, iters, body, w)


def mgda_combine(task_grads: jnp.ndarray, normalization: str = "l2",
                 losses: jnp.ndarray | None = None) -> jnp.ndarray:
    """MGDA combined gradient from stacked flat task grads [T, P].

    Grad normalizers follow reference mgda.py:111-123 ('l2', 'loss',
    'loss+', 'none').
    """
    if normalization == "l2":
        gn = jnp.linalg.norm(task_grads, axis=1)
    elif normalization == "loss":
        gn = losses
    elif normalization == "loss+":
        gn = losses * jnp.linalg.norm(task_grads, axis=1)
    else:
        gn = jnp.ones(task_grads.shape[0], task_grads.dtype)
    g = task_grads / jnp.maximum(gn, 1e-12)[:, None]
    w = minnorm_weights(g @ g.T)
    return w @ g


def cagrad_combine(task_grads: jnp.ndarray, c: float = 0.4,
                   rescale: int = 1, iters: int = 50) -> jnp.ndarray:
    """Conflict-averse gradient (reference CAGrad.py:11-68).

    Replaces the scipy SLSQP solve (CAGrad.py:54) with projected gradient
    descent on the simplex objective  w^T g0 + sqrt(phi) * ||g_w||.
    """
    t, _ = task_grads.shape
    gg = task_grads @ task_grads.T                    # [T, T]
    gg = gg.astype(jnp.float32)
    g0_norm = jnp.sqrt(jnp.maximum(jnp.mean(gg), 0.0)) + 1e-8
    phi = (c * g0_norm) ** 2
    b = jnp.mean(gg, axis=1)                          # <g_i, g0>

    def obj_grad(w):
        gwsq = jnp.maximum(w @ gg @ w, 0.0)
        return b + jnp.sqrt(phi) * (gg @ w) / (jnp.sqrt(gwsq) + 1e-8)

    def body(i, w):
        return _project_simplex(w - 0.2 * obj_grad(w) / (g0_norm + 1e-8))

    w = jax.lax.fori_loop(0, iters, body, jnp.full((t,), 1.0 / t))
    gw = w @ task_grads
    gw_norm = jnp.linalg.norm(gw) + 1e-8
    lmbda = jnp.sqrt(phi) / gw_norm
    g = jnp.mean(task_grads, 0) + lmbda * gw
    if rescale == 0:
        return g
    if rescale == 1:
        return g / (1.0 + c ** 2)
    return g / (1.0 + c)
