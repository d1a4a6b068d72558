"""Independent reimplementation of pycocotools COCOeval (bbox, area='all').

pycocotools is not installed in this image, so the cross-validation demanded
by the reference's eval path (utils/utils_map.py:894-922 calls
COCOeval(cocoGt, cocoDt, 'bbox')) is done against this oracle: a from-scratch
transcription of the published COCOeval algorithm (evaluateImg + accumulate,
github.com/cocodataset/cocoapi/PythonAPI/pycocotools/cocoeval.py), written
deliberately in its per-image/matrix style — structurally unlike
achelous_tpu/utils/metrics.py — so agreement between the two is meaningful.

Scope: useCats=1, areaRng 'all' (no ignore regions, no crowd), maxDets=100,
iouThrs 0.5:0.05:0.95, recThrs 0:0.01:1.  Returns the COCO stats the
reference consumes: AP, AP50, AP75, AR100.
"""
from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """maskUtils.iou for xyxy boxes (iscrowd all False)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    x1 = np.maximum(dt[:, None, 0], gt[None, :, 0])
    y1 = np.maximum(dt[:, None, 1], gt[None, :, 1])
    x2 = np.minimum(dt[:, None, 2], gt[None, :, 2])
    y2 = np.minimum(dt[:, None, 3], gt[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a_dt = (dt[:, 2] - dt[:, 0]) * (dt[:, 3] - dt[:, 1])
    a_gt = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = a_dt[:, None] + a_gt[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-300), 0.0)


def _evaluate_img(dt_boxes, dt_scores, gt_boxes, max_det):
    """COCOeval.evaluateImg for one (image, category): match matrices over
    all IoU thresholds at once."""
    order = np.argsort(-dt_scores, kind="mergesort")[:max_det]
    dt_boxes, dt_scores = dt_boxes[order], dt_scores[order]
    T, D, G = len(IOU_THRS), len(dt_boxes), len(gt_boxes)
    ious = _iou_matrix(dt_boxes, gt_boxes)
    dtm = np.zeros((T, D))
    gtm = np.zeros((T, G))
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0:
                    continue
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m > -1:
                dtm[tind, dind] = 1
                gtm[tind, m] = 1
    return {"dtMatches": dtm, "dtScores": dt_scores, "numGt": G}


def coco_stats(detections, ground_truths, num_classes, max_det=100):
    """COCOeval.evaluate + accumulate + summarize over in-memory dets/gts.

    Same input schema as achelous_tpu.utils.metrics.compute_det_metrics.
    """
    n_img = len(detections)
    T, R = len(IOU_THRS), len(REC_THRS)
    precision = -np.ones((T, R, num_classes))
    recall = -np.ones((T, num_classes))

    for k in range(num_classes):
        evals = []
        for img in range(n_img):
            det, gt = detections[img], ground_truths[img]
            dm = np.asarray(det["classes"]) == k
            gm = np.asarray(gt["classes"]) == k
            if not dm.any() and not gm.any():
                continue
            evals.append(_evaluate_img(
                np.asarray(det["boxes"], np.float64).reshape(-1, 4)[dm],
                np.asarray(det["scores"], np.float64)[dm],
                np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[gm],
                max_det))
        if not evals:
            continue
        dt_scores = np.concatenate([e["dtScores"] for e in evals])
        inds = np.argsort(-dt_scores, kind="mergesort")
        dtm = np.concatenate([e["dtMatches"] for e in evals], 1)[:, inds]
        npig = sum(e["numGt"] for e in evals)
        if npig == 0:
            continue
        tps = dtm == 1
        fps = dtm == 0
        tp_sum = np.cumsum(tps, 1).astype(float)
        fp_sum = np.cumsum(fps, 1).astype(float)
        for t in range(T):
            tp, fp = tp_sum[t], fp_sum[t]
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            recall[t, k] = rc[-1] if nd else 0
            pr = pr.tolist()
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            q = np.zeros(R)
            pts = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(pts):
                if pi < nd:
                    q[ri] = pr[pi]
            precision[:, :, k][t] = q

    def _mean(x):
        x = x[x > -1]
        return float(np.mean(x)) if len(x) else -1.0

    return {
        "AP": _mean(precision),
        "AP50": _mean(precision[0]),
        "AP75": _mean(precision[5]),
        "AR100": _mean(recall),
    }
