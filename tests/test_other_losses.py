"""Segmentation / pc / multitask loss tests vs numpy oracles."""
import numpy as np
import jax.numpy as jnp

from achelous_tpu.losses.segmentation import (ce_loss, dice_loss, focal_loss,
                                              pc_nll_loss)
from achelous_tpu.losses.multitask import (cagrad_combine, mgda_combine,
                                           minnorm_weights,
                                           uncertainty_weighted)


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_ce_loss_with_ignore():
    rng = np.random.RandomState(0)
    nc = 4
    logits = rng.randn(2, 8, 8, nc).astype(np.float32)
    target = rng.randint(0, nc + 1, (2, 8, 8))   # nc == ignore index
    got = float(ce_loss(jnp.asarray(logits), jnp.asarray(target), None, nc))
    p = softmax(logits.reshape(-1, nc))
    t = target.reshape(-1)
    keep = t != nc
    want = -np.log(p[np.arange(len(t)), np.where(keep, t, 0)])[keep].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_mean_includes_ignored():
    rng = np.random.RandomState(1)
    nc = 3
    logits = rng.randn(1, 4, 4, nc).astype(np.float32)
    target = rng.randint(0, nc + 1, (1, 4, 4))
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(target), None, nc))
    p = softmax(logits.reshape(-1, nc))
    t = target.reshape(-1)
    keep = t != nc
    nll = np.where(keep, -np.log(p[np.arange(len(t)), np.where(keep, t, 0)]), 0)
    logpt = -nll
    pt = np.exp(logpt)
    want = (-((1 - pt) ** 2) * 0.5 * logpt).mean()   # mean over ALL positions
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_dice_loss_oracle():
    rng = np.random.RandomState(2)
    nc = 3
    logits = rng.randn(2, 4, 4, nc).astype(np.float32)
    onehot = np.eye(nc + 1)[rng.randint(0, nc + 1, (2, 4, 4))].astype(np.float32)
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(onehot)))
    p = softmax(logits.reshape(2, -1, nc))
    t = onehot.reshape(2, -1, nc + 1)
    tp = (t[..., :-1] * p).sum((0, 1))
    fp = p.sum((0, 1)) - tp
    fn = t[..., :-1].sum((0, 1)) - tp
    score = (2 * tp + 1e-5) / (2 * tp + fn + fp + 1e-5)
    np.testing.assert_allclose(got, 1 - score.mean(), rtol=1e-5)


def test_pc_nll():
    rng = np.random.RandomState(3)
    lp = np.log(softmax(rng.randn(2, 16, 8).astype(np.float32)))
    lab = rng.randint(0, 8, (2, 16))
    got = float(pc_nll_loss(jnp.asarray(lp), jnp.asarray(lab)))
    want = -lp[np.arange(2)[:, None], np.arange(16)[None], lab].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_uncertainty_weighting_unit_at_zero():
    losses = [jnp.asarray(2.0), jnp.asarray(3.0), jnp.asarray(4.0)]
    got = uncertainty_weighted(losses, jnp.zeros(3), regularize=False)
    np.testing.assert_allclose(float(got), 9.0)


def test_minnorm_weights_two_tasks():
    # analytic: min ||w g1 + (1-w) g2||^2 -> w* = g2.(g2-g1)/||g1-g2||^2
    g = np.array([[1.0, 0.0], [0.0, 2.0]])
    gram = g @ g.T
    w = np.asarray(minnorm_weights(jnp.asarray(gram), iters=300))
    want = 4.0 / 5.0   # g2.(g2-g1)/|g1-g2|^2 = 4/5 for these grads
    np.testing.assert_allclose(w[0], want, atol=1e-3)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)


def test_mgda_combined_grad_nonconflicting():
    g = np.stack([np.array([1.0, 0.0]), np.array([1.0, 0.1])])
    comb = np.asarray(mgda_combine(jnp.asarray(g), normalization="none"))
    # combined direction must have non-negative dot with every task grad
    assert (g @ comb >= -1e-5).all()


def test_cagrad_reduces_to_mean_when_agreeing():
    g = np.stack([np.array([1.0, 1.0]), np.array([1.0, 1.0])])
    comb = np.asarray(cagrad_combine(jnp.asarray(g), c=0.4, rescale=1))
    mean = g.mean(0)
    # same direction as the mean gradient
    cos = comb @ mean / (np.linalg.norm(comb) * np.linalg.norm(mean))
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
