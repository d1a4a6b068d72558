"""YOLOX detection loss with SimOTA dynamic-k assignment — static shapes.

reference loss/detection_loss.py:13-411.  The reference runs SimOTA as Python
loops per image (detection_loss.py:141) and per GT (:372-377) under
torch.no_grad; here the whole assignment is a batched, fully-vectorized
computation under jax.lax.stop_gradient:

  * GTs are padded to a fixed MAX_GT with a validity mask,
  * the "fg anchor" compaction (boolean indexing) becomes cost masking,
  * the per-GT variable-k top-k becomes a fixed top-10 + rank mask
    (dynamic_ks <= 10 always, since k = clamp(int(sum(top10 ious)), 1)),
  * conflict resolution is an argmin over the GT axis.

Semantics match the reference exactly for every image whose in-box/center
anchor pool is >= its dynamic k (the overwhelmingly common case); constants:
center_radius=2.5, cost outside-center penalty 1e5, reg_weight 5.0, giou.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG_COST = 1e9  # excludes non-fg anchors / invalid GTs from top-k selection


def _bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy on logits (stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def _bce_probs(p, targets, eps=1e-12):
    """torch F.binary_cross_entropy on probabilities (clamped log)."""
    # torch clamps log values at -100
    logp = jnp.maximum(jnp.log(p + eps), -100.0)
    log1mp = jnp.maximum(jnp.log(1.0 - p + eps), -100.0)
    return -(targets * logp + (1.0 - targets) * log1mp)


def pairwise_iou_cxcywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between [G,4] and [A,4] cxcywh boxes (detection_loss.py:250-272,
    xyxy=False branch)."""
    tl = jnp.maximum(a[:, None, :2] - a[:, None, 2:] / 2,
                     b[None, :, :2] - b[None, :, 2:] / 2)
    br = jnp.minimum(a[:, None, :2] + a[:, None, 2:] / 2,
                     b[None, :, :2] + b[None, :, 2:] / 2)
    area_a = jnp.prod(a[:, 2:], 1)
    area_b = jnp.prod(b[:, 2:], 1)
    en = jnp.all(tl < br, axis=-1).astype(a.dtype)
    area_i = jnp.prod(br - tl, axis=-1) * en
    return area_i / (area_a[:, None] + area_b[None, :] - area_i + 1e-16)


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU on cxcywh boxes, per row (detection_loss.py:19-50,
    loss_type='giou' as instantiated at :67)."""
    tl = jnp.maximum(pred[:, :2] - pred[:, 2:] / 2,
                     target[:, :2] - target[:, 2:] / 2)
    br = jnp.minimum(pred[:, :2] + pred[:, 2:] / 2,
                     target[:, :2] + target[:, 2:] / 2)
    area_p = jnp.prod(pred[:, 2:], 1)
    area_g = jnp.prod(target[:, 2:], 1)
    en = jnp.all(tl < br, axis=-1).astype(pred.dtype)
    area_i = jnp.prod(br - tl, 1) * en
    area_u = area_p + area_g - area_i
    iou = area_i / (area_u + 1e-16)
    c_tl = jnp.minimum(pred[:, :2] - pred[:, 2:] / 2,
                       target[:, :2] - target[:, 2:] / 2)
    c_br = jnp.maximum(pred[:, :2] + pred[:, 2:] / 2,
                       target[:, :2] + target[:, 2:] / 2)
    area_c = jnp.maximum(jnp.prod(c_br - c_tl, 1), 1e-16)
    giou = iou - (area_c - area_u) / area_c
    return 1.0 - jnp.clip(giou, -1.0, 1.0)


@functools.lru_cache(maxsize=None)
def _anchor_geometry(hw: tuple, strides: tuple):
    """Static (x_shifts, y_shifts, stride) per anchor, level-major."""
    xs, ys, ss = [], [], []
    for (h, w), s in zip(hw, strides):
        yv, xv = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        xs.append(xv.reshape(-1))
        ys.append(yv.reshape(-1))
        ss.append(np.full(h * w, s))
    return (np.concatenate(xs).astype(np.float32),
            np.concatenate(ys).astype(np.float32),
            np.concatenate(ss).astype(np.float32))


def simota_assign(decoded_boxes, obj_logits, cls_logits, gt_boxes, gt_classes,
                  gt_mask, x_c, y_c, strides, num_classes,
                  center_radius: float = 2.5):
    """SimOTA assignment for one image (detection_loss.py:193-411).

    Args:
      decoded_boxes: [A, 4] cxcywh, pixel scale.
      obj_logits:    [A], cls_logits: [A, K] (raw logits).
      gt_boxes:      [G, 4] cxcywh pixels (padded), gt_classes [G] int,
                     gt_mask [G] bool validity.
      x_c, y_c:      [A] anchor centers in pixels, strides [A].
    Returns:
      fg_mask [A] bool, matched_gt [A] int, pred_ious [A], num_fg scalar.
    """
    a = decoded_boxes.shape[0]
    g = gt_boxes.shape[0]

    # --- in-box / in-center priors (get_in_boxes_info, :275-349) ---
    gl = gt_boxes[:, 0] - 0.5 * gt_boxes[:, 2]
    gr = gt_boxes[:, 0] + 0.5 * gt_boxes[:, 2]
    gt_ = gt_boxes[:, 1] - 0.5 * gt_boxes[:, 3]
    gb = gt_boxes[:, 1] + 0.5 * gt_boxes[:, 3]
    in_box = ((x_c[None, :] > gl[:, None]) & (x_c[None, :] < gr[:, None]) &
              (y_c[None, :] > gt_[:, None]) & (y_c[None, :] < gb[:, None]))
    cl = gt_boxes[:, 0][:, None] - center_radius * strides[None, :]
    cr = gt_boxes[:, 0][:, None] + center_radius * strides[None, :]
    ct = gt_boxes[:, 1][:, None] - center_radius * strides[None, :]
    cb = gt_boxes[:, 1][:, None] + center_radius * strides[None, :]
    in_center = ((x_c[None, :] > cl) & (x_c[None, :] < cr) &
                 (y_c[None, :] > ct) & (y_c[None, :] < cb))
    in_box = in_box & gt_mask[:, None]
    in_center = in_center & gt_mask[:, None]
    fg_cand = jnp.any(in_box, 0) | jnp.any(in_center, 0)   # is_in_boxes_anchor
    in_both = in_box & in_center

    # --- pairwise cost (get_assignments, :209-241) ---
    ious = pairwise_iou_cxcywh(gt_boxes, decoded_boxes)     # [G, A]
    iou_cost = -jnp.log(ious + 1e-8)
    probs = (jax.nn.sigmoid(cls_logits.astype(jnp.float32)) *
             jax.nn.sigmoid(obj_logits.astype(jnp.float32))[:, None])  # [A,K]
    gt_onehot = jax.nn.one_hot(gt_classes, num_classes, dtype=jnp.float32)
    cls_cost = jnp.sum(
        _bce_probs(jnp.sqrt(probs)[None, :, :], gt_onehot[:, None, :]), -1)
    cost = cls_cost + 3.0 * iou_cost + 100000.0 * (~in_both)
    # exclude non-candidate anchors and padded GTs entirely
    invalid = (~fg_cand[None, :]) | (~gt_mask[:, None])
    cost = jnp.where(invalid, BIG_COST, cost)
    ious_m = jnp.where(invalid, 0.0, ious)

    # --- dynamic-k (dynamic_k_matching, :351-377) ---
    topk_ious = jax.lax.top_k(ious_m, min(10, a))[0]        # [G, 10]
    dynamic_ks = jnp.clip(jnp.sum(topk_ious, 1).astype(jnp.int32), 1, None)
    # per-GT: mark the dynamic_ks[g] lowest-cost anchors
    neg_cost_top, top_idx = jax.lax.top_k(-cost, min(10, a))  # [G, 10] lowest costs
    rank = jnp.arange(min(10, a))[None, :]
    take = (rank < dynamic_ks[:, None]) & gt_mask[:, None]
    # suppress picks that fell on BIG_COST (fewer candidates than k)
    take = take & (-neg_cost_top < BIG_COST)
    matching = jnp.zeros((g, a), jnp.float32)
    matching = matching.at[jnp.arange(g)[:, None], top_idx].max(
        take.astype(jnp.float32))

    # --- conflict resolution (:381-391): anchor claimed by >1 GT keeps the
    # min-cost GT ---
    claimed = jnp.sum(matching, 0)
    best_gt = jnp.argmin(cost, 0)                            # [A]
    keep = jax.nn.one_hot(best_gt, g, axis=0, dtype=matching.dtype)  # [G, A]
    matching = jnp.where(claimed[None, :] > 1, matching * keep, matching)

    fg_mask = jnp.sum(matching, 0) > 0.0
    matched_gt = jnp.argmax(matching, 0)                     # [A]
    pred_ious = jnp.sum(matching * ious_m, 0)                # [A]
    num_fg = jnp.sum(fg_mask.astype(jnp.float32))
    return fg_mask, matched_gt, pred_ious, num_fg


class YoloXLoss:
    """Batched YOLOX loss (reference YOLOLoss, detection_loss.py:60-191).

    Call with the head's raw NHWC maps and padded GT arrays; returns
    sum-of-losses / total num_fg exactly as the reference.
    """

    def __init__(self, num_classes: int, strides: Sequence[int] = (8, 16, 32)):
        self.num_classes = num_classes
        self.strides = tuple(strides)

    def __call__(self, det_maps: Sequence[jnp.ndarray], gt_boxes: jnp.ndarray,
                 gt_classes: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
        """det_maps: 3x [B, H, W, 5+K] NHWC raw head outputs.
        gt_boxes [B, G, 4] cxcywh pixels; gt_classes [B, G]; gt_mask [B, G]."""
        hw = tuple((m.shape[1], m.shape[2]) for m in det_maps)
        b = det_maps[0].shape[0]
        ch = det_maps[0].shape[-1]
        flat = jnp.concatenate(
            [m.reshape(b, -1, ch) for m in det_maps], 1).astype(jnp.float32)
        x_c_np, y_c_np, s_np = _anchor_geometry(hw, self.strides)
        s = jnp.asarray(s_np)
        x_c = (jnp.asarray(x_c_np) + 0.5) * s
        y_c = (jnp.asarray(y_c_np) + 0.5) * s

        # train-path decode (get_output_and_grid, :97-109): pixel scale,
        # logits left raw for the BCE-with-logits terms.
        xy = (flat[..., :2] + jnp.stack([jnp.asarray(x_c_np),
                                         jnp.asarray(y_c_np)], -1)) * s[:, None]
        # clamp wh logits so a transient divergence cannot emit inf boxes and
        # poison the whole loss with NaNs (exp(20) * 32 ~ 1.5e10 px already)
        wh = jnp.exp(jnp.minimum(flat[..., 2:4], 20.0)) * s[:, None]
        boxes = jnp.concatenate([xy, wh], -1)                # [B, A, 4]
        obj_logits = flat[..., 4]
        cls_logits = flat[..., 5:]

        assign = jax.vmap(lambda bx, ol, cl, gb, gc, gm: simota_assign(
            bx, ol, cl, gb, gc, gm, x_c, y_c, s, self.num_classes))
        fg, mgt, pious, nfg = jax.lax.stop_gradient(assign(
            boxes, obj_logits, cls_logits,
            gt_boxes.astype(jnp.float32), gt_classes, gt_mask))

        num_fg = jnp.maximum(jnp.sum(nfg), 1.0)
        fg_f = fg.astype(jnp.float32)

        # targets (get_losses, :169-172)
        batch_ix = jnp.arange(b)[:, None]
        reg_t = gt_boxes.astype(jnp.float32)[batch_ix, mgt]  # [B, A, 4]
        cls_t = (jax.nn.one_hot(gt_classes[batch_ix, mgt], self.num_classes,
                                dtype=jnp.float32) * pious[..., None])
        obj_t = fg_f[..., None]

        loss_iou = jnp.sum(
            giou_loss(boxes.reshape(-1, 4), reg_t.reshape(-1, 4)) *
            fg_f.reshape(-1))
        loss_obj = jnp.sum(_bce_with_logits(obj_logits[..., None], obj_t))
        loss_cls = jnp.sum(
            jnp.sum(_bce_with_logits(cls_logits, cls_t), -1) * fg_f)
        return (5.0 * loss_iou + loss_obj + loss_cls) / num_fg
