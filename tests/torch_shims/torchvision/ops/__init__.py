"""torchvision.ops stand-ins: deform_conv2d (v2, modulated) and
batched_nms — pure torch, documented semantics."""
import torch


def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                  padding=(0, 0), dilation=(1, 1), mask=None):
    """Modulated deformable convolution v2 (torchvision semantics).

    input  [B, C, H, W]; offset [B, 2*kh*kw, Ho, Wo] ((dy, dx) per kernel
    tap, row-major taps); weight [Cout, C/groups, kh, kw];
    mask [B, kh*kw, Ho, Wo] or None.  Bilinear sampling, zeros outside.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    b, c, h, w = input.shape
    cout, cpg, kh, kw = weight.shape
    groups = c // cpg
    ho = (h + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    wo = (w + 2 * padding[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1
    if mask is None:
        mask = torch.ones(b, kh * kw, ho, wo, dtype=input.dtype)

    ys = torch.arange(ho, dtype=input.dtype) * stride[0] - padding[0]
    xs = torch.arange(wo, dtype=input.dtype) * stride[1] - padding[1]
    base_y = ys.view(1, 1, ho, 1)
    base_x = xs.view(1, 1, 1, wo)

    cols = []
    for di in range(kh):
        for dj in range(kw):
            k = di * kw + dj
            py = base_y + di * dilation[0] + offset[:, 2 * k].unsqueeze(1)
            px = base_x + dj * dilation[1] + offset[:, 2 * k + 1].unsqueeze(1)
            # bilinear sample with zero padding
            y0 = torch.floor(py)
            x0 = torch.floor(px)
            wy = py - y0
            wx = px - x0
            out = 0.0
            for oy, sy in ((0, 1 - wy), (1, wy)):
                for ox, sx in ((0, 1 - wx), (1, wx)):
                    yy = (y0 + oy).long()
                    xx = (x0 + ox).long()
                    valid = ((yy >= 0) & (yy < h) & (xx >= 0) &
                             (xx < w)).to(input.dtype)
                    yc = yy.clamp(0, h - 1)
                    xc = xx.clamp(0, w - 1)
                    flat = input.reshape(b, c, h * w)
                    idx = (yc * w + xc).reshape(b, 1, -1).expand(b, c, -1)
                    g = torch.gather(flat, 2, idx).reshape(b, c, *yy.shape[2:])
                    out = out + g * (sy * sx * valid)
            cols.append(out * mask[:, k].unsqueeze(1))
    # cols: kh*kw tensors [B, C, Ho, Wo] -> conv = sum over taps and cin
    col = torch.stack(cols, dim=2)          # [B, C, K, Ho, Wo]
    col = col.reshape(b, groups, cpg, kh * kw, ho, wo)
    wg = weight.reshape(groups, cout // groups, cpg, kh * kw)
    out = torch.einsum("bgckhw,gock->bgohw", col, wg)
    out = out.reshape(b, cout, ho, wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class boxes:
    @staticmethod
    def batched_nms(bxs, scores, idxs, iou_threshold):
        """Class-aware greedy NMS (torchvision semantics)."""
        if bxs.numel() == 0:
            return torch.empty(0, dtype=torch.long)
        off = idxs.to(bxs.dtype) * (bxs.max() + 1)
        bo = bxs + off[:, None]
        order = torch.argsort(scores, descending=True, stable=True)
        keep = []
        alive = torch.ones(len(bxs), dtype=torch.bool)
        for i in order.tolist():
            if not alive[i]:
                continue
            keep.append(i)
            x1 = torch.maximum(bo[i, 0], bo[:, 0])
            y1 = torch.maximum(bo[i, 1], bo[:, 1])
            x2 = torch.minimum(bo[i, 2], bo[:, 2])
            y2 = torch.minimum(bo[i, 3], bo[:, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            a1 = (bo[i, 2] - bo[i, 0]) * (bo[i, 3] - bo[i, 1])
            a2 = (bo[:, 2] - bo[:, 0]) * (bo[:, 3] - bo[:, 1])
            iou = inter / (a1 + a2 - inter)
            alive &= ~(iou > iou_threshold)
        return torch.tensor(keep, dtype=torch.long)


batched_nms = boxes.batched_nms


def nms(bxs, scores, iou_threshold):
    """Single-class greedy NMS (torchvision.ops.nms semantics)."""
    return boxes.batched_nms(bxs, scores,
                             torch.zeros(len(bxs), dtype=torch.long),
                             iou_threshold)
