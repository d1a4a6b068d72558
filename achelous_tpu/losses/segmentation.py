"""Segmentation losses: cross-entropy / focal / dice.

reference loss/segmentation_loss.py:9-59.  Inputs are NHWC logits; the
integer target uses `num_classes` as the ignore index (the dataloader clips
labels >= num_classes to num_classes, reference utils/dataloader.py:112-126);
dice consumes the one-hot target whose extra last slot is the ignore class
(dropped via [..., :-1]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ce_loss(logits: jnp.ndarray, target: jnp.ndarray,
            cls_weights: jnp.ndarray | None, num_classes: int) -> jnp.ndarray:
    """Weighted CE with ignore_index=num_classes
    (segmentation_loss.py:9-19; torch mean = sum(w*l)/sum(w) over kept)."""
    c = logits.shape[-1]
    logits = logits.reshape(-1, c).astype(jnp.float32)
    target = target.reshape(-1)
    keep = (target != num_classes)
    tgt = jnp.where(keep, target, 0)
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, tgt[:, None], -1)[:, 0]
    if cls_weights is None:
        w = keep.astype(jnp.float32)
    else:
        w = jnp.asarray(cls_weights, jnp.float32)[tgt] * keep
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
               cls_weights: jnp.ndarray | None, num_classes: int,
               alpha: float = 0.5, gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss (segmentation_loss.py:22-38): mean over ALL positions —
    ignored positions contribute 0 loss but count in the denominator,
    matching torch reduction='none' + .mean()."""
    c = logits.shape[-1]
    logits = logits.reshape(-1, c).astype(jnp.float32)
    target = target.reshape(-1)
    keep = (target != num_classes)
    tgt = jnp.where(keep, target, 0)
    logp_all = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp_all, tgt[:, None], -1)[:, 0]
    if cls_weights is not None:
        nll = nll * jnp.asarray(cls_weights, jnp.float32)[tgt]
    nll = nll * keep                    # torch CE 'none' yields 0 at ignored
    logpt = -nll
    pt = jnp.exp(logpt)
    loss = -((1.0 - pt) ** gamma) * (alpha * logpt)
    return jnp.mean(loss)


def dice_loss(logits: jnp.ndarray, onehot_target: jnp.ndarray,
              beta: float = 1.0, smooth: float = 1e-5) -> jnp.ndarray:
    """Dice over softmax probs vs one-hot target with the trailing ignore
    slot dropped (segmentation_loss.py:41-59)."""
    n = logits.shape[0]
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.reshape(n, -1, c).astype(jnp.float32), -1)
    tgt = onehot_target.reshape(n, -1, onehot_target.shape[-1]).astype(jnp.float32)
    tp = jnp.sum(tgt[..., :-1] * probs, axis=(0, 1))
    fp = jnp.sum(probs, axis=(0, 1)) - tp
    fn = jnp.sum(tgt[..., :-1], axis=(0, 1)) - tp
    score = ((1 + beta ** 2) * tp + smooth) / (
        (1 + beta ** 2) * tp + beta ** 2 * fn + fp + smooth)
    return 1.0 - jnp.mean(score)


def pc_nll_loss(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """NLL over per-point log-probs [B, N, K], labels [B, N].

    reference loss/pc_seg_loss.py:6-12 — but applied to the model's log-probs
    ONCE (fixing the double-log-softmax bug at utils/utils_fit.py:125, where
    log_softmax is re-applied over the wrong dim to already-log outputs).
    """
    lp = log_probs.astype(jnp.float32)
    picked = jnp.take_along_axis(lp, labels[..., None].astype(jnp.int32), -1)
    return -jnp.mean(picked)


def f_score(logits: jnp.ndarray, onehot_target: jnp.ndarray, beta: float = 1,
            smooth: float = 1e-5, threshold: float = 0.5) -> jnp.ndarray:
    """Training-time seg F-score metric (reference utils_seg/utils_metrics.py:12-32)."""
    n = logits.shape[0]
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.reshape(n, -1, c).astype(jnp.float32), -1)
    tgt = onehot_target.reshape(n, -1, onehot_target.shape[-1]).astype(jnp.float32)
    pred = (probs > threshold).astype(jnp.float32)
    tp = jnp.sum(tgt[..., :-1] * pred, axis=(0, 1))
    fp = jnp.sum(pred, axis=(0, 1)) - tp
    fn = jnp.sum(tgt[..., :-1], axis=(0, 1)) - tp
    score = ((1 + beta ** 2) * tp + smooth) / (
        (1 + beta ** 2) * tp + beta ** 2 * fn + fp + smooth)
    return jnp.mean(score)
