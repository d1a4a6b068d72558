"""Golden tests for decode + NMS vs an independent pure-numpy oracle that
follows the reference semantics (utils/utils_bbox.py:33-181 and torchvision
batched_nms) exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.ops.postprocess import (decode_outputs, non_max_suppression,
                                          yolo_correct_boxes)


def np_decode(outputs, input_shape):
    """Oracle: reference decode_outputs in numpy."""
    hw = [(o.shape[1], o.shape[2]) for o in outputs]
    b = outputs[0].shape[0]
    ch = outputs[0].shape[-1]
    flat = np.concatenate([o.reshape(b, -1, ch) for o in outputs], axis=1)
    grids, strides = [], []
    for h, w in hw:
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grids.append(np.stack([xs, ys], -1).reshape(-1, 2))
        strides.append(np.full((h * w, 1), input_shape[0] / h))
    grid = np.concatenate(grids, 0)
    stride = np.concatenate(strides, 0)
    out = flat.copy()
    out[..., 4:] = 1 / (1 + np.exp(-out[..., 4:]))
    out[..., :2] = (out[..., :2] + grid) * stride
    out[..., 2:4] = np.exp(out[..., 2:4]) * stride
    out[..., [0, 2]] /= input_shape[1]
    out[..., [1, 3]] /= input_shape[0]
    return out


def np_greedy_batched_nms(boxes, scores, idxs, thresh):
    """Oracle: torchvision batched_nms (class offsets + greedy, IoU > t)."""
    if len(boxes) == 0:
        return []
    off = idxs.astype(np.float64) * (boxes.max() + 1)
    b = boxes + off[:, None]
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        x1 = np.maximum(b[i, 0], b[:, 0]); y1 = np.maximum(b[i, 1], b[:, 1])
        x2 = np.minimum(b[i, 2], b[:, 2]); y2 = np.minimum(b[i, 3], b[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a1 = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
        a2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        iou = inter / (a1 + a2 - inter + 1e-16)
        alive &= ~(iou > thresh)
    return keep


def test_decode_matches_oracle():
    rng = np.random.RandomState(0)
    hw = [(8, 8), (4, 4), (2, 2)]
    outs = [rng.randn(2, h, w, 12).astype(np.float32) for h, w in hw]
    got = np.asarray(decode_outputs([jnp.asarray(o) for o in outs], (64, 64)))
    want = np_decode(outs, (64, 64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nms_matches_oracle():
    rng = np.random.RandomState(1)
    num_classes, a = 7, 300
    conf_thres, nms_thres = 0.3, 0.45
    # decoded rows: cx, cy, w, h in [0,1]-ish, then obj/cls probs
    decoded = np.zeros((a, 5 + num_classes), np.float32)
    decoded[:, 0:2] = rng.uniform(0.1, 0.9, (a, 2))
    decoded[:, 2:4] = rng.uniform(0.05, 0.3, (a, 2))
    decoded[:, 4] = rng.uniform(0, 1, a)
    decoded[:, 5:] = rng.uniform(0, 1, (a, num_classes))

    dets = jax.jit(lambda d: non_max_suppression(
        d[None], num_classes, conf_thres, nms_thres, max_det=200))(
        jnp.asarray(decoded))
    got_boxes = np.asarray(dets.boxes[0])[np.asarray(dets.valid[0])]
    got_cls = np.asarray(dets.cls_idx[0])[np.asarray(dets.valid[0])]

    # oracle (reference non_max_suppression flow)
    boxes = np.concatenate([decoded[:, :2] - decoded[:, 2:4] / 2,
                            decoded[:, :2] + decoded[:, 2:4] / 2], -1)
    cls_conf = decoded[:, 5:].max(-1)
    cls_idx = decoded[:, 5:].argmax(-1)
    score = decoded[:, 4] * cls_conf
    mask = score >= conf_thres
    sel = np.where(mask)[0]
    keep = np_greedy_batched_nms(boxes[sel], score[sel], cls_idx[sel],
                                 nms_thres)
    want_boxes = boxes[sel][keep]
    want_cls = cls_idx[sel][keep]

    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got_cls, want_cls)


def test_nms_empty_when_nothing_passes_threshold():
    decoded = np.zeros((50, 12), np.float32)
    decoded[:, 4] = 0.01
    dets = non_max_suppression(jnp.asarray(decoded)[None], 7, 0.5, 0.4)
    assert not bool(np.asarray(dets.valid).any())


def test_decode_clamps_exploded_wh():
    # one diverged wh logit must not produce inf boxes (mirror of the loss
    # path's exp-clamp at 20)
    outs = [np.zeros((1, 4, 4, 12), np.float32)]
    outs[0][0, 0, 0, 2:4] = 1e4
    got = np.asarray(decode_outputs([jnp.asarray(outs[0])], (64, 64)))
    assert np.all(np.isfinite(got))
    assert got[0, 0, 2] <= np.exp(20.0) * 16 / 64 + 1


def test_nms_survives_nan_inf_injection():
    """One poisoned prediction must not corrupt the keep mask of sane ones
    (the torchvision data-dependent class offset would go inf -> NaN IoU)."""
    rng = np.random.RandomState(2)
    num_classes, a = 7, 64
    decoded = np.zeros((a, 5 + num_classes), np.float32)
    decoded[:, 0:2] = rng.uniform(0.2, 0.8, (a, 2))
    decoded[:, 2:4] = rng.uniform(0.05, 0.2, (a, 2))
    decoded[:, 4] = rng.uniform(0.5, 1.0, a)
    decoded[:, 5:] = rng.uniform(0.5, 1.0, (a, num_classes))

    clean = non_max_suppression(jnp.asarray(decoded)[None], num_classes,
                                0.3, 0.45, max_det=64)

    poisoned = decoded.copy()
    poisoned[0, 0] = np.nan          # NaN center
    poisoned[1, 2] = np.inf          # inf width
    poisoned[2, 4] = np.nan          # NaN objectness
    dets = non_max_suppression(jnp.asarray(poisoned)[None], num_classes,
                               0.3, 0.45, max_det=64)
    valid = np.asarray(dets.valid[0])
    assert np.all(np.isfinite(np.asarray(dets.boxes[0])[valid]))

    # the sane subset must be kept identically to running without the
    # poisoned rows at all
    ref = non_max_suppression(jnp.asarray(decoded[3:])[None], num_classes,
                              0.3, 0.45, max_det=64)
    ref_valid = np.asarray(ref.valid[0])
    clean_boxes = np.asarray(ref.boxes[0])[ref_valid]
    got_boxes = np.asarray(dets.boxes[0])[valid]
    # poisoned rows 0-2 are dropped (non-finite box or NaN score)
    np.testing.assert_allclose(
        np.sort(got_boxes, axis=0), np.sort(clean_boxes, axis=0),
        rtol=1e-5, atol=1e-6)
    del clean


def test_yolo_correct_boxes_roundtrip():
    # a full-frame box on a letterboxed 16:9 image maps back to full frame
    img_shape = (1080, 1920)
    inp = (320, 320)
    scale = min(inp[0] / img_shape[0], inp[1] / img_shape[1])
    new = (round(img_shape[0] * scale), round(img_shape[1] * scale))
    top = (inp[0] - new[0]) / 2
    box = np.array([[0.0, top / inp[0], 1.0, (top + new[0]) / inp[0]]])
    out = yolo_correct_boxes(box, inp, img_shape, True)
    np.testing.assert_allclose(out[0], [0, 0, 1080, 1920], atol=1.0)
