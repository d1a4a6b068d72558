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


def minnorm_weights(gram: jnp.ndarray, iters: int = 250) -> jnp.ndarray:
    """Min-norm element of the convex hull of task gradients.

    Solves min_w w^T G w over the simplex (the MGDA subproblem, reference
    loss/mgda.py:23-109) by Frank-Wolfe with EXACT line search — the same
    algorithm family as the reference's `_find_min_norm_element`, but
    branch-free and fully jittable.  Golden-tested against scipy SLSQP
    (tests/test_gradient_surgery_golden.py).
    """
    t = gram.shape[0]
    gram = gram.astype(jnp.float32)
    w = jnp.full((t,), 1.0 / t, jnp.float32)

    def body(i, w):
        gw = gram @ w
        # FW vertex: the coordinate with the most-negative directional deriv
        s = jax.nn.one_hot(jnp.argmin(gw), t, dtype=w.dtype)
        d = s - w
        dgd = d @ gram @ d
        # exact minimizer of the quadratic along w + gamma*d, gamma in [0,1]
        gamma = jnp.clip(-(d @ gw) / jnp.maximum(dgd, 1e-12), 0.0, 1.0)
        return w + gamma * d

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
                   rescale: int = 1, iters: int = 200) -> jnp.ndarray:
    """Conflict-averse gradient (reference CAGrad.py:11-68).

    Replaces the scipy SLSQP solve (CAGrad.py:54) with Frank-Wolfe on the
    simplex objective  F(w) = w^T A b + cc * ||g_w||  (A = Gram matrix,
    b = uniform weights, cc = c * ||g0||).  Along a FW segment w + gamma*d
    the stationarity condition is a QUADRATIC in gamma, so the line search
    is closed-form: solve it, evaluate F on {0, 1, roots} and keep the best.
    Golden-tested against the reference's scipy formulation
    (tests/test_gradient_surgery_golden.py).
    """
    t, _ = task_grads.shape
    A = (task_grads @ task_grads.T).astype(jnp.float32)   # [T, T]
    g0_norm = jnp.sqrt(jnp.maximum(jnp.mean(A), 0.0) + 1e-8)
    cc = c * g0_norm + 1e-8                               # CAGrad.py:47
    b = jnp.mean(A, axis=1)                               # A @ (1/T)
    eps = 1e-8

    def F(w):
        return w @ b + cc * jnp.sqrt(jnp.maximum(w @ A @ w, 0.0) + eps)

    def body(i, w):
        Aw = A @ w
        wAw = jnp.maximum(w @ Aw, 0.0) + eps
        grad = b + cc * Aw / jnp.sqrt(wAw)
        s = jax.nn.one_hot(jnp.argmin(grad), t, dtype=w.dtype)
        d = s - w
        beta = d @ b
        wAd = d @ Aw
        dAd = jnp.maximum(d @ A @ d, 1e-12)
        # dF/dgamma = 0  =>  beta^2 (wAw + 2g wAd + g^2 dAd) = cc^2 (wAd + g dAd)^2
        qa = beta ** 2 * dAd - cc ** 2 * dAd ** 2
        qb = 2.0 * (beta ** 2 * wAd - cc ** 2 * wAd * dAd)
        qc = beta ** 2 * wAw - cc ** 2 * wAd ** 2
        disc = jnp.sqrt(jnp.maximum(qb ** 2 - 4.0 * qa * qc, 0.0))
        denom = jnp.where(jnp.abs(qa) > 1e-20, 2.0 * qa, 1.0)
        r1 = jnp.clip((-qb + disc) / denom, 0.0, 1.0)
        r2 = jnp.clip((-qb - disc) / denom, 0.0, 1.0)
        cands = jnp.stack([jnp.float32(0.0), jnp.float32(1.0), r1, r2])
        vals = jax.vmap(lambda g: F(w + g * d))(cands)
        gamma = cands[jnp.argmin(vals)]
        return w + gamma * d

    w = jax.lax.fori_loop(0, iters, body, jnp.full((t,), 1.0 / t, jnp.float32))
    gw = w @ task_grads
    gw_norm = jnp.linalg.norm(gw) + 1e-8
    lmbda = cc / gw_norm
    g = jnp.mean(task_grads, 0) + lmbda * gw
    if rescale == 0:
        return g
    if rescale == 1:
        return g / (1.0 + c ** 2)
    return g / (1.0 + c)
