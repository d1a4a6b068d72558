"""Learning-rate schedule parity against the ACTUAL reference functions.

Imports loss/detection_loss.get_lr_scheduler from the read-only reference
checkout and compares our per-epoch schedules value-for-value, plus the
batch-size lr-fit clamp rule (train.py:489-494).
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "torch_shims")

pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
for p in (SHIM, REF):
    if p not in sys.path:
        sys.path.insert(0, p)

from loss.detection_loss import get_lr_scheduler as ref_sched  # noqa: E402

from achelous_tpu.train.schedule import get_lr_scheduler, scale_lr  # noqa: E402


@pytest.mark.parametrize("epochs", [30, 100, 300])
@pytest.mark.parametrize("decay", ["cos", "step"])
def test_schedule_matches_reference(decay, epochs):
    lr, min_lr = 0.02, 0.0002
    ours = get_lr_scheduler(decay, lr, min_lr, epochs)
    ref = ref_sched(decay, lr, min_lr, epochs)
    got = np.array([ours(e) for e in range(epochs)])
    want = np.array([ref(e) for e in range(epochs)])
    np.testing.assert_allclose(got, want, rtol=1e-12,
                               err_msg=f"{decay}@{epochs} diverges")


def test_cos_shape_properties():
    f = get_lr_scheduler("cos", 0.02, 0.0002, 100)
    assert f(0) < f(3)                      # quadratic warmup rises
    assert f(99) == pytest.approx(0.0002)   # min-lr tail
    mid = [f(e) for e in range(4, 94)]
    assert all(a >= b for a, b in zip(mid, mid[1:]))   # cosine decreases


@pytest.mark.parametrize("opt,bs,lr,want_init", [
    # clamps from train.py:490-494: sgd in [5e-4, 5e-2], adam in [3e-4, 1e-3]
    ("sgd", 64, 0.03, 0.03),          # inside the band: bs/nbs = 1
    ("sgd", 4, 0.03, 5e-4 * 3.75),    # 4/64*0.03 = 1.875e-3, above min
    ("sgd", 1, 0.001, 5e-4),          # clamps up to lr_limit_min
    ("sgd", 2048, 0.03, 5e-2),        # clamps down to lr_limit_max
    ("adam", 64, 0.01, 1e-3),         # adam max clamp
    ("adam", 1, 1e-4, 3e-4),          # adam min clamp
])
def test_scale_lr_clamp_parity(opt, bs, lr, want_init):
    nbs = 64
    lr_max = 1e-3 if opt == "adam" else 5e-2
    lr_min = 3e-4 if opt == "adam" else 5e-4
    ref_init = min(max(bs / nbs * lr, lr_min), lr_max)
    ref_min = min(max(bs / nbs * lr * 0.01, lr_min * 1e-2), lr_max * 1e-2)
    init_fit, min_fit = scale_lr(lr, bs, opt)
    assert init_fit == pytest.approx(ref_init) == pytest.approx(want_init)
    assert min_fit == pytest.approx(ref_min)
