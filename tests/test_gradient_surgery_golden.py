"""Golden tests for the pure-JAX MGDA / CAGrad simplex solvers against scipy.

The reference solves these subproblems with a Frank-Wolfe loop
(loss/mgda.py:23-109) and scipy SLSQP (loss/CAGrad.py:40-60).  Our jittable
replacements (losses/multitask.py) use fixed-iteration projected gradient
descent; these tests pin them to scipy's answers on known Gram matrices.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from achelous_tpu.losses.multitask import (cagrad_combine, minnorm_weights,
                                           mgda_combine)


def _scipy_minnorm(gram: np.ndarray) -> tuple[np.ndarray, float]:
    t = gram.shape[0]
    res = minimize(
        lambda w: float(w @ gram @ w), np.full(t, 1.0 / t),
        jac=lambda w: 2.0 * gram @ w,
        bounds=[(0.0, 1.0)] * t,
        constraints=({"type": "eq", "fun": lambda w: 1.0 - w.sum()},),
        method="SLSQP", options={"ftol": 1e-12, "maxiter": 500})
    return res.x, float(res.fun)


@pytest.mark.parametrize("seed,t", [(0, 2), (1, 3), (2, 4), (3, 4)])
def test_minnorm_matches_scipy(seed, t):
    rng = np.random.RandomState(seed)
    g = rng.randn(t, 16).astype(np.float32)
    gram = g @ g.T
    w_ref, obj_ref = _scipy_minnorm(gram.astype(np.float64))
    w = np.asarray(minnorm_weights(jnp.asarray(gram), iters=300))
    assert abs(w.sum() - 1.0) < 1e-5 and (w >= -1e-6).all()
    obj = float(w @ gram @ w)
    # same optimum (objective is the invariant; the argmin may be non-unique)
    assert obj <= obj_ref * 1.01 + 1e-8
    np.testing.assert_allclose(obj, obj_ref, rtol=1e-2, atol=1e-6)


def test_minnorm_conflicting_pair_closed_form():
    """For two gradients, min-norm weights have the closed form
    gamma = (v2v2 - v1v2) / (v1v1 + v2v2 - 2 v1v2) (mgda.py:25-35)."""
    g1 = np.array([1.0, 0.0], np.float32)
    g2 = np.array([-0.5, 2.0], np.float32)
    g = np.stack([g1, g2])
    gram = g @ g.T
    v11, v12, v22 = gram[0, 0], gram[0, 1], gram[1, 1]
    gamma = (v22 - v12) / (v11 + v22 - 2 * v12)
    w = np.asarray(minnorm_weights(jnp.asarray(gram), iters=300))
    np.testing.assert_allclose(w, [gamma, 1 - gamma], atol=1e-4)


def _scipy_cagrad(grads: np.ndarray, calpha: float, rescale: int
                  ) -> np.ndarray:
    """Reference CAGrad.backward math verbatim (loss/CAGrad.py:40-68)."""
    t = grads.shape[0]
    GG = grads @ grads.T
    g0_norm = np.sqrt(GG.mean() + 1e-8)
    b = np.full(t, 1.0 / t)
    c = calpha * g0_norm + 1e-8

    def objfn(x):
        return float(x @ GG @ b + c * np.sqrt(x @ GG @ x + 1e-8))

    res = minimize(objfn, b.copy(), bounds=[(0, 1)] * t,
                   constraints=({"type": "eq",
                                 "fun": lambda x: 1 - x.sum()},))
    ww = res.x
    gw = ww @ grads
    lmbda = c / (np.linalg.norm(gw) + 1e-8)
    g = grads.mean(0) + lmbda * gw
    if rescale == 0:
        return g
    if rescale == 1:
        return g / (1 + calpha ** 2)
    return g / (1 + calpha)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cagrad_matches_scipy(seed):
    rng = np.random.RandomState(seed)
    grads = rng.randn(4, 64).astype(np.float32)
    ref = _scipy_cagrad(grads.astype(np.float64), calpha=0.5, rescale=1)
    ours = np.asarray(cagrad_combine(jnp.asarray(grads), c=0.5, rescale=1,
                                     iters=300))
    # direction must agree; magnitude within a few percent (PGD vs SLSQP)
    cos = ref @ ours / (np.linalg.norm(ref) * np.linalg.norm(ours))
    assert cos > 0.999
    np.testing.assert_allclose(np.linalg.norm(ours), np.linalg.norm(ref),
                               rtol=3e-2)


def test_mgda_combined_gradient_pareto_property():
    """The MGDA direction must have non-negative inner product with every
    (normalized) task gradient — the defining Pareto-descent property."""
    rng = np.random.RandomState(7)
    grads = rng.randn(4, 32).astype(np.float32)
    d = np.asarray(mgda_combine(jnp.asarray(grads), "l2"))
    gn = grads / np.linalg.norm(grads, axis=1, keepdims=True)
    assert (gn @ d >= -1e-4).all()
