"""Metric goldens against the reference's OWN implementations:
log_average_miss_rate (utils/utils_map.py:31-67), fast_hist / per-class
IoU/PA/Precision (utils_seg/utils_metrics.py:36-62), and the torch f_score
(utils_seg/utils_metrics.py:12-32)."""
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
from utils.utils_map import log_average_miss_rate as ref_lamr  # noqa: E402
from utils_seg.utils_metrics import (fast_hist as ref_hist,  # noqa: E402
                                     f_score as ref_f_score,
                                     per_Accuracy, per_class_iu as ref_iu,
                                     per_class_PA_Recall,
                                     per_class_Precision)

from achelous_tpu.losses.segmentation import f_score  # noqa: E402
from achelous_tpu.utils.metrics import (fast_hist,  # noqa: E402
                                        log_average_miss_rate, per_accuracy,
                                        per_class_iu, per_class_pa_recall,
                                        per_class_precision)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lamr_matches_reference(seed):
    rng = np.random.RandomState(seed)
    n = 40
    prec = np.sort(rng.rand(n))[::-1]
    fp_cum = np.cumsum(rng.randint(0, 3, n)).astype(np.float64)
    want, _, _ = ref_lamr(prec, fp_cum, num_images=25)
    got, _, _ = log_average_miss_rate(prec, fp_cum, num_images=25)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_hist_and_per_class_metrics_match_reference():
    rng = np.random.RandomState(3)
    n = 9
    a = rng.randint(0, n + 2, 5000)        # includes out-of-range (ignore)
    b = rng.randint(0, n, 5000)
    want_h = ref_hist(a, b, n)
    got_h = fast_hist(a, b, n)
    np.testing.assert_array_equal(got_h, want_h)
    np.testing.assert_allclose(per_class_iu(got_h), ref_iu(want_h))
    np.testing.assert_allclose(per_class_pa_recall(got_h),
                               per_class_PA_Recall(want_h))
    np.testing.assert_allclose(per_class_precision(got_h),
                               per_class_Precision(want_h))
    np.testing.assert_allclose(per_accuracy(got_h), per_Accuracy(want_h))


def test_f_score_matches_reference_torch():
    rng = np.random.RandomState(4)
    n, h, w, c = 2, 16, 16, 5
    logits = rng.randn(n, h, w, c).astype(np.float32)
    labels = rng.randint(0, c + 1, (n, h, w))
    onehot = np.eye(c + 1, dtype=np.float32)[labels]
    want = ref_f_score(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                       torch.from_numpy(onehot)).item()
    got = float(f_score(jnp.asarray(logits), jnp.asarray(onehot)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
