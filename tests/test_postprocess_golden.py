"""Decode + NMS + unletterbox chain golden against the reference's ACTUAL
utils/utils_bbox.py (decode_outputs / non_max_suppression /
yolo_correct_boxes), with torchvision batched_nms provided by the
documented-semantics shim.

The reference decode hardcodes `.cuda(local_rank)` (utils_bbox.py:73-74);
Tensor.cuda is patched to identity for the CPU run.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "torch_shims")
torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
for p in (SHIM, REF):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax.numpy as jnp  # noqa: E402
from utils import utils_bbox as ref_bbox  # noqa: E402

from achelous_tpu.ops.postprocess import (decode_outputs,  # noqa: E402
                                          non_max_suppression,
                                          yolo_correct_boxes)

RES = 64
NUM_CLASSES = 7
IMAGE_SHAPE = (96, 128)      # original (h, w) — letterbox has real bars


def _random_levels(rng, b):
    """3 head levels, NHWC, logits scaled so some boxes pass conf 0.3 and
    wh stays in the unclamped range."""
    levels = []
    for s in (8, 16, 32):
        h = RES // s
        x = rng.randn(b, h, h, 5 + NUM_CLASSES).astype(np.float32)
        x[..., 4] += 1.0          # more positive objectness
        levels.append(x)
    return levels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_decode_nms_chain_matches_reference(seed, monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    rng = np.random.RandomState(seed)
    b = 2
    levels = _random_levels(rng, b)

    torch_levels = [torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
                    for x in levels]
    ref_decoded = ref_bbox.decode_outputs(torch_levels, (RES, RES), 0)
    ref_out = ref_bbox.non_max_suppression(
        ref_decoded.clone(), NUM_CLASSES, (RES, RES), IMAGE_SHAPE,
        letterbox_image=True, conf_thres=0.3, nms_thres=0.4)

    decoded = decode_outputs([jnp.asarray(x) for x in levels], (RES, RES))
    dets = non_max_suppression(decoded, NUM_CLASSES, 0.3, 0.4)

    for i in range(b):
        v = np.asarray(dets.valid[i])
        boxes_px = yolo_correct_boxes(np.asarray(dets.boxes[i])[v],
                                      (RES, RES), IMAGE_SHAPE, True)
        ours = np.concatenate(
            [boxes_px,
             np.asarray(dets.obj_conf[i])[v, None],
             np.asarray(dets.cls_conf[i])[v, None],
             np.asarray(dets.cls_idx[i])[v, None].astype(np.float32)], -1)
        want = ref_out[i]
        if want is None:
            assert len(ours) == 0
            continue
        assert ours.shape == want.shape, \
            f"image {i}: {ours.shape} vs {want.shape} detections"
        # both are emitted in descending score order
        np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"image {i} chain diverges")


def test_decoded_tensor_matches_reference(monkeypatch):
    """The [B, A, 5+K] decoded tensor itself (anchor order, grid math,
    normalization) must match before any thresholding."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    rng = np.random.RandomState(9)
    levels = _random_levels(rng, 1)
    torch_levels = [torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
                    for x in levels]
    want = ref_bbox.decode_outputs(torch_levels, (RES, RES), 0).numpy()
    got = np.asarray(decode_outputs([jnp.asarray(x) for x in levels],
                                    (RES, RES)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
