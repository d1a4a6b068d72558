"""On-device detection postprocess: decode + class-aware NMS.

Replaces reference utils/utils_bbox.py:33-181 (decode_outputs +
torchvision.ops.boxes.batched_nms) with a fully jittable static-shape
pipeline.  Semantics match the reference at fp32 tolerance:

  decode: per-level (xy + grid) * stride, exp(wh) * stride, sigmoid(obj/cls),
          normalized to [0, 1] (utils_bbox.py:49,78-84)
  nms:    per-image max-class score, threshold obj*cls >= conf, then greedy
          class-aware NMS (batched_nms semantics via an explicit same-class
          pair mask, suppress when IoU > thresh), emitted in score order
          (utils_bbox.py:109-132); non-finite predictions are dropped and
          box coords clipped to a fixed range before the IoU matrix

The greedy loop is expressed as `max_det` argmax-emit-suppress steps over the
full anchor set — each step is one [A]-wide vector op, which is far cheaper on
TPU than a sequential O(A) pass and returns exactly the torch result.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# Fixed clip range for NMS candidate boxes (normalized coords are ~[0, 1];
# anything beyond this is a diverged prediction being sanitized, not data).
_BOX_CAP = 1e4


def make_grids(hw: Sequence[Tuple[int, int]], input_h: float) -> tuple[np.ndarray, np.ndarray]:
    """Static anchor grid (x, y) and per-anchor stride, level-major row-major
    (reference utils_bbox.py:50-74)."""
    grids, strides = [], []
    for h, w in hw:
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        g = np.stack([xs, ys], axis=-1).reshape(-1, 2)
        grids.append(g)
        strides.append(np.full((h * w, 1), input_h / h))
    return (np.concatenate(grids, 0).astype(np.float32),
            np.concatenate(strides, 0).astype(np.float32))


def decode_outputs(outputs: Sequence[jnp.ndarray],
                   input_shape: Tuple[int, int]) -> jnp.ndarray:
    """Decode NHWC head maps -> [B, A, 5+K] normalized (cx, cy, w, h, obj, cls...).

    reference utils_bbox.py:33-85 (which flattens NCHW maps row-major — the
    NHWC flatten here yields the identical anchor order).
    """
    hw = [(o.shape[1], o.shape[2]) for o in outputs]
    b = outputs[0].shape[0]
    ch = outputs[0].shape[-1]
    flat = jnp.concatenate([o.reshape(b, -1, ch) for o in outputs], axis=1)
    grids, strides = make_grids(hw, float(input_shape[0]))
    grids = jnp.asarray(grids, flat.dtype)
    strides = jnp.asarray(strides, flat.dtype)
    xy = (flat[..., :2] + grids) * strides
    # clamp mirrors the loss path's exp-clamp (losses/detection.py) so one
    # diverged logit can't produce inf boxes that poison downstream NMS
    wh = jnp.exp(jnp.minimum(flat[..., 2:4], 20.0)) * strides
    scores = jax.nn.sigmoid(flat[..., 4:])
    norm = jnp.asarray([input_shape[1], input_shape[0],
                        input_shape[1], input_shape[0]], flat.dtype)
    boxes = jnp.concatenate([xy, wh], axis=-1) / norm
    return jnp.concatenate([boxes, scores], axis=-1)


class Detections(NamedTuple):
    """Static-shape padded detections; columns mirror the reference 7-tuple
    (utils_bbox.py:120-122)."""
    boxes: jnp.ndarray      # [B, max_det, 4] x1,y1,x2,y2 (normalized)
    obj_conf: jnp.ndarray   # [B, max_det]
    cls_conf: jnp.ndarray   # [B, max_det]
    cls_idx: jnp.ndarray    # [B, max_det] int32
    valid: jnp.ndarray      # [B, max_det] bool


def _pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU of [P, 4] xyxy boxes (torchvision box_iou math)."""
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area[:, None] + area[None, :] - inter + 1e-16)


def nms_single(decoded: jnp.ndarray, num_classes: int, conf_thres: float,
               nms_thres: float, max_det: int = 100,
               pre_nms_topk: int = 512) -> Detections:
    """Greedy class-aware NMS for one image's decoded predictions [A, 5+K].

    Reproduces utils_bbox.py:87-132 (cxcywh->xyxy, obj*maxcls >= conf filter,
    torchvision batched_nms: class offsets, suppress strictly-greater IoU,
    descending score order) on the top `pre_nms_topk` candidates.

    TPU formulation: one top-k, one [P, P] pairwise-IoU matrix, then a
    fixpoint suppression loop — K_{n+1} = {i : no higher-scored j in K_n with
    IoU > t}.  The fixpoint IS the greedy solution and is reached in at most
    the longest suppression-chain length (typically < 8) iterations of pure
    [P, P] vector ops, instead of max_det sequential argmax steps.
    """
    decoded = decoded.astype(jnp.float32)
    cxcy, wh = decoded[:, :2], decoded[:, 2:4]
    boxes = jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)
    obj = decoded[:, 4]
    cls_conf = jnp.max(decoded[:, 5:5 + num_classes], axis=-1)
    scores = obj * cls_conf
    live = scores >= conf_thres

    live = live & jnp.all(jnp.isfinite(boxes), axis=-1)

    p = min(pre_nms_topk, decoded.shape[0])
    cand_scores, cand = jax.lax.top_k(jnp.where(live, scores, -1.0), p)
    cand_live = cand_scores >= jnp.maximum(conf_thres, 0.0)
    # Class argmax over ALL anchors, indexed by the candidate set.  The
    # "cheaper" alternative — gather the [P, 5+K] candidate slab first and
    # argmax only that — looked like it should kill the 4.2%
    # iota_reduce_fusion in TRACE_SUMMARY_BS1.txt, but MEASURED 15% SLOWER
    # end-to-end (tools/diag_cf_regress.py, 2026-08-19: bs=1 full pipeline
    # 3.44 ms with the candidate-slab gather vs 2.99 ms with this form —
    # the offset-5 [1, K]-slice row gather lowers to a far worse TPU
    # program than the wide argmax it saved).  Do not "optimize" this
    # without re-running that A/B.
    ccls = jnp.argmax(decoded[:, 5:5 + num_classes],
                      axis=-1).astype(jnp.int32)[cand]
    # Clip candidate boxes to a fixed finite range: non-finite boxes are
    # already dropped from `live` above, this guards merely-huge ones so a
    # single diverged prediction can't skew the IoU matrix (the torchvision
    # `cls * (boxes.max()+1)` offset trick is data-dependent and one inf box
    # poisons every offset; we mask cross-class pairs explicitly instead,
    # which is the exact batched_nms semantics with no precision loss).
    cboxes = jnp.clip(jnp.nan_to_num(boxes[cand], nan=0.0, posinf=_BOX_CAP,
                                     neginf=-_BOX_CAP), -_BOX_CAP, _BOX_CAP)

    iou = _pairwise_iou(cboxes)
    same_class = ccls[:, None] == ccls[None, :]
    # overlap[i, j]: candidate j (strictly higher rank, same class) can
    # suppress i
    rank = jnp.arange(p)
    overlap = (iou > nms_thres) & same_class & (rank[None, :] < rank[:, None])
    overlap = overlap & cand_live[None, :] & cand_live[:, None]

    def body(state):
        keep, prev, it = state
        suppressed = jnp.any(overlap & keep[None, :], axis=1)
        new_keep = cand_live & ~suppressed
        return new_keep, keep, it + 1

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < p)

    keep, _, _ = jax.lax.while_loop(
        cond, body, (cand_live, jnp.zeros_like(cand_live), 0))

    # compact kept candidates (already score-sorted) into max_det slots
    order = jnp.argsort(~keep, stable=True)[:max_det]
    valid = keep[order]
    return Detections(cboxes[order], obj[cand][order], cls_conf[cand][order],
                      ccls[order], valid)


def non_max_suppression(decoded: jnp.ndarray, num_classes: int,
                        conf_thres: float = 0.5, nms_thres: float = 0.4,
                        max_det: int = 100) -> Detections:
    """Batched NMS over [B, A, 5+K] decoded predictions."""
    return jax.vmap(lambda d: nms_single(d, num_classes, conf_thres,
                                         nms_thres, max_det))(decoded)


def yolo_correct_boxes(boxes: np.ndarray, input_shape, image_shape,
                       letterbox_image: bool = True) -> np.ndarray:
    """Un-letterbox normalized xyxy boxes to original-image pixel coords.

    reference utils/utils_bbox.py:5-30 (host-side, numpy).
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    box_xy = (boxes[..., 0:2] + boxes[..., 2:4]) / 2
    box_wh = boxes[..., 2:4] - boxes[..., 0:2]
    box_yx = box_xy[..., ::-1]
    box_hw = box_wh[..., ::-1]
    input_shape = np.array(input_shape, dtype=np.float32)
    image_shape = np.array(image_shape, dtype=np.float32)
    if letterbox_image:
        new_shape = np.round(image_shape * np.min(input_shape / image_shape))
        off = (input_shape - new_shape) / 2.0 / input_shape
        scale = input_shape / new_shape
        box_yx = (box_yx - off) * scale
        box_hw = box_hw * scale
    mins = box_yx - box_hw / 2.0
    maxs = box_yx + box_hw / 2.0
    out = np.concatenate([mins, maxs], axis=-1)
    out *= np.concatenate([image_shape, image_shape], axis=-1)
    return out
