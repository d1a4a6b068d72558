"""SimOTA + YOLOX loss vs an independent numpy oracle that mirrors the
reference torch flow (loss/detection_loss.py:60-411) step by step, including
its quirks (int-truncated dynamic k, outside-center 1e5 penalty, conflict
argmin, giou loss, sum/num_fg reduction)."""
import numpy as np
import jax
import jax.numpy as jnp

from achelous_tpu.losses.detection import YoloXLoss


def sigmoid(x):
    return 1 / (1 + np.exp(-x))


def np_pairwise_iou(a, b):
    tl = np.maximum(a[:, None, :2] - a[:, None, 2:] / 2,
                    b[None, :, :2] - b[None, :, 2:] / 2)
    br = np.minimum(a[:, None, :2] + a[:, None, 2:] / 2,
                    b[None, :, :2] + b[None, :, 2:] / 2)
    area_a = np.prod(a[:, 2:], 1)
    area_b = np.prod(b[:, 2:], 1)
    en = np.all(tl < br, axis=-1).astype(np.float64)
    area_i = np.prod(br - tl, -1) * en
    return area_i / (area_a[:, None] + area_b[None, :] - area_i)


def np_giou(pred, target):
    tl = np.maximum(pred[:, :2] - pred[:, 2:] / 2, target[:, :2] - target[:, 2:] / 2)
    br = np.minimum(pred[:, :2] + pred[:, 2:] / 2, target[:, :2] + target[:, 2:] / 2)
    area_p = np.prod(pred[:, 2:], 1)
    area_g = np.prod(target[:, 2:], 1)
    en = np.all(tl < br, -1).astype(np.float64)
    area_i = np.prod(br - tl, 1) * en
    area_u = area_p + area_g - area_i
    iou = area_i / (area_u + 1e-16)
    ctl = np.minimum(pred[:, :2] - pred[:, 2:] / 2, target[:, :2] - target[:, 2:] / 2)
    cbr = np.maximum(pred[:, :2] + pred[:, 2:] / 2, target[:, :2] + target[:, 2:] / 2)
    area_c = np.clip(np.prod(cbr - ctl, 1), 1e-16, None)
    giou = iou - (area_c - area_u) / area_c
    return 1 - np.clip(giou, -1, 1)


def np_bce_logits(x, t):
    return np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x)))


def oracle_loss(det_maps, gts_list, num_classes, strides=(8, 16, 32),
                center_radius=2.5):
    """Reference YOLOLoss.forward in numpy; gts_list: per-image [n,5]
    (cx,cy,w,h,cls) pixel boxes."""
    b = det_maps[0].shape[0]
    flats, xs, ys, ss = [], [], [], []
    for m, s in zip(det_maps, strides):
        h, w = m.shape[1], m.shape[2]
        flats.append(m.reshape(b, -1, m.shape[-1]))
        yv, xv = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        xs.append(xv.reshape(-1)); ys.append(yv.reshape(-1))
        ss.append(np.full(h * w, s))
    flat = np.concatenate(flats, 1).astype(np.float64)
    x_sh = np.concatenate(xs); y_sh = np.concatenate(ys)
    stride = np.concatenate(ss).astype(np.float64)
    boxes = np.concatenate([(flat[..., :2] + np.stack([x_sh, y_sh], -1)) * stride[:, None],
                            np.exp(flat[..., 2:4]) * stride[:, None]], -1)
    obj = flat[..., 4]; cls = flat[..., 5:]
    a = flat.shape[1]
    x_c = (x_sh + 0.5) * stride; y_c = (y_sh + 0.5) * stride

    total_iou = total_obj = total_cls = 0.0
    num_fg_total = 0.0
    for bi in range(b):
        gts = gts_list[bi]
        obj_t = np.zeros(a)
        if len(gts) == 0:
            total_obj += np_bce_logits(obj[bi], obj_t).sum()
            continue
        gb, gc = gts[:, :4], gts[:, 4].astype(int)
        g = len(gb)
        in_box = ((x_c[None] > (gb[:, 0] - gb[:, 2] / 2)[:, None]) &
                  (x_c[None] < (gb[:, 0] + gb[:, 2] / 2)[:, None]) &
                  (y_c[None] > (gb[:, 1] - gb[:, 3] / 2)[:, None]) &
                  (y_c[None] < (gb[:, 1] + gb[:, 3] / 2)[:, None]))
        in_ctr = ((x_c[None] > gb[:, 0][:, None] - center_radius * stride[None]) &
                  (x_c[None] < gb[:, 0][:, None] + center_radius * stride[None]) &
                  (y_c[None] > gb[:, 1][:, None] - center_radius * stride[None]) &
                  (y_c[None] < gb[:, 1][:, None] + center_radius * stride[None]))
        fg_cand = in_box.any(0) | in_ctr.any(0)
        idx = np.where(fg_cand)[0]
        in_both = (in_box & in_ctr)[:, idx]
        ious = np_pairwise_iou(gb, boxes[bi][idx])
        iou_cost = -np.log(ious + 1e-8)
        p = sigmoid(cls[bi][idx]) * sigmoid(obj[bi][idx])[:, None]
        sp = np.sqrt(p)
        onehot = np.eye(num_classes)[gc]
        cls_cost = -(onehot[:, None] * np.log(np.clip(sp, 1e-12, None))[None] +
                     (1 - onehot[:, None]) * np.log(np.clip(1 - sp, 1e-12, None))[None]).sum(-1)
        cost = cls_cost + 3 * iou_cost + 1e5 * (~in_both)
        # dynamic k
        k = min(10, ious.shape[1])
        topk = -np.sort(-ious, 1)[:, :k]
        dyn = np.maximum(topk.sum(1).astype(int), 1)
        match = np.zeros_like(cost)
        for gi in range(g):
            pos = np.argsort(cost[gi])[:dyn[gi]]
            match[gi, pos] = 1
        claimed = match.sum(0)
        conflict = claimed > 1
        if conflict.any():
            best = np.argmin(cost[:, conflict], 0)
            match[:, conflict] = 0
            match[best, np.where(conflict)[0]] = 1
        fg_in = match.sum(0) > 0
        n_fg = fg_in.sum()
        num_fg_total += n_fg
        mg = match[:, fg_in].argmax(0)
        anchors = idx[fg_in]
        pious = (match * ious).sum(0)[fg_in]

        obj_t[anchors] = 1
        cls_t = np.eye(num_classes)[gc[mg]] * pious[:, None]
        reg_t = gb[mg]
        total_iou += np_giou(boxes[bi][anchors], reg_t).sum()
        total_cls += np_bce_logits(cls[bi][anchors], cls_t).sum()
        total_obj += np_bce_logits(obj[bi], obj_t).sum()
    return (5 * total_iou + total_obj + total_cls) / max(num_fg_total, 1)


def make_case(seed=0, b=2, num_classes=7, res=64):
    rng = np.random.RandomState(seed)
    hw = [(res // 8, res // 8), (res // 16, res // 16), (res // 32, res // 32)]
    maps = [rng.randn(b, h, w, 5 + num_classes).astype(np.float32) * 0.5
            for h, w in hw]
    gts = []
    for i in range(b):
        n = rng.randint(1, 5)
        cx = rng.uniform(8, res - 8, n); cy = rng.uniform(8, res - 8, n)
        w_ = rng.uniform(6, 24, n); h_ = rng.uniform(6, 24, n)
        c = rng.randint(0, num_classes, n)
        gts.append(np.stack([cx, cy, w_, h_, c], 1).astype(np.float32))
    return maps, gts


def pad_gts(gts_list, max_gt=10):
    b = len(gts_list)
    boxes = np.zeros((b, max_gt, 4), np.float32)
    cls = np.zeros((b, max_gt), np.int32)
    mask = np.zeros((b, max_gt), bool)
    for i, g in enumerate(gts_list):
        n = len(g)
        boxes[i, :n] = g[:, :4]
        cls[i, :n] = g[:, 4]
        mask[i, :n] = True
    return jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(mask)


def test_yolox_loss_matches_oracle():
    for seed in range(4):
        maps, gts = make_case(seed)
        want = oracle_loss(maps, gts, 7)
        loss_fn = YoloXLoss(7)
        gb, gc, gm = pad_gts(gts)
        got = jax.jit(lambda ms, gb, gc, gm: loss_fn(ms, gb, gc, gm))(
            [jnp.asarray(m) for m in maps], gb, gc, gm)
        np.testing.assert_allclose(float(got), want, rtol=2e-4), seed


def test_yolox_loss_no_gt_image():
    maps, gts = make_case(3)
    gts[0] = np.zeros((0, 5), np.float32)   # empty-GT image
    want = oracle_loss(maps, gts, 7)
    loss_fn = YoloXLoss(7)
    gb, gc, gm = pad_gts(gts)
    got = loss_fn([jnp.asarray(m) for m in maps], gb, gc, gm)
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_yolox_loss_has_finite_grads():
    maps, gts = make_case(1)
    loss_fn = YoloXLoss(7)
    gb, gc, gm = pad_gts(gts)

    def f(ms):
        return loss_fn(ms, gb, gc, gm)

    grads = jax.grad(f)([jnp.asarray(m) for m in maps])
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gr).sum()) > 0
