"""Metric sanity: perfect predictions give perfect scores; known partial
cases give hand-computable values."""
import numpy as np

from achelous_tpu.utils.metrics import (compute_det_metrics, compute_miou,
                                        compute_voc_map, pc_mean_iou,
                                        fast_hist)


def test_miou_perfect_and_partial():
    gt = np.array([[0, 1], [2, 2]])
    assert compute_miou([gt], [gt], 3)["miou"] == 1.0
    pred = np.array([[0, 1], [2, 0]])   # one class-2 pixel wrong
    r = compute_miou([gt], [pred], 3)
    # class0: inter 1, union 2 -> 0.5; class1: 1/1; class2: 1/2
    np.testing.assert_allclose(r["iou"], [0.5, 1.0, 0.5])


def test_pc_mean_iou():
    conf = np.array([[5, 0], [0, 5]])
    assert pc_mean_iou(conf) == 1.0
    conf = np.array([[4, 1], [1, 4]])
    np.testing.assert_allclose(pc_mean_iou(conf), 4 / 6)


def _perfect_case():
    gts = [{"boxes": np.array([[10, 10, 50, 50], [60, 60, 90, 90.0]]),
            "classes": np.array([0, 1])}]
    dets = [{"boxes": gts[0]["boxes"].copy(),
             "scores": np.array([0.9, 0.8]),
             "classes": np.array([0, 1])}]
    return dets, gts


def test_det_map_perfect():
    dets, gts = _perfect_case()
    m = compute_det_metrics(dets, gts, num_classes=2)
    assert m["mAP50"] > 0.99 and m["mAP50-95"] > 0.99 and m["AR100"] > 0.99
    v = compute_voc_map(dets, gts, 2)
    assert v["mAP"] > 0.99


def test_det_map_false_positive_penalized():
    dets, gts = _perfect_case()
    # add a high-scoring FP of class 0
    dets[0]["boxes"] = np.vstack([dets[0]["boxes"],
                                  [200, 200, 240, 240]])
    dets[0]["scores"] = np.array([0.9, 0.8, 0.95])
    dets[0]["classes"] = np.array([0, 1, 0])
    m = compute_det_metrics(dets, gts, num_classes=2)
    # class 0 AP drops (FP ranked first), class 1 stays perfect
    assert 0.4 < m["mAP50"] < 1.0


def test_det_map_localization_quality():
    gts = [{"boxes": np.array([[10, 10, 50, 50.0]]), "classes": np.array([0])}]
    # IoU = 0.75 box: passes thresholds .5-.75 (6 of 10), fails .8+
    dets = [{"boxes": np.array([[10, 10, 40, 50.0]]),
             "scores": np.array([0.9]), "classes": np.array([0])}]
    m = compute_det_metrics(dets, gts, num_classes=1)
    assert m["mAP50"] > 0.99
    np.testing.assert_allclose(m["mAP50-95"], 0.6, atol=0.01)


def test_fast_hist_ignores_out_of_range():
    a = np.array([0, 1, 5])   # label 5 out of range for n=3 -> ignored
    b = np.array([0, 1, 1])
    h = fast_hist(a, b, 3)
    assert h.sum() == 2 and h[0, 0] == 1 and h[1, 1] == 1


def test_log_average_miss_rate():
    from achelous_tpu.utils.metrics import log_average_miss_rate
    # perfect detector: precision 1 everywhere, no FPs -> lamr ~ miss rate 0
    prec = np.array([1.0, 1.0, 1.0])
    fp = np.array([0.0, 0.0, 0.0])
    lamr, mr, fppi = log_average_miss_rate(prec, fp, 10)
    assert lamr < 1e-5
    lamr0, mr0, fppi0 = log_average_miss_rate(np.array([]), np.array([]), 10)
    assert lamr0 == 0.0 and mr0 == 1.0


def test_pc_projection_roundtrip(tmp_path):
    from achelous_tpu.utils.pc_projection import (
        get_camera_projection_matrix, get_t_camera_radar,
        project_pcl_to_image)
    calib = tmp_path / "calib"
    calib.mkdir()
    # identity extrinsic, f=100 pinhole at (320, 240)
    t = np.eye(4, dtype=np.float32).reshape(-1)
    p = np.array([[100, 0, 320, 0], [0, 100, 240, 0], [0, 0, 1, 0]],
                 np.float32).reshape(-1)
    (calib / "f1.txt").write_text(
        "T: " + " ".join(map(str, t)) + "\n" +
        "P: " + " ".join(map(str, p)) + "\n")
    T = get_t_camera_radar(str(tmp_path), "f1")
    P = get_camera_projection_matrix(str(tmp_path), "f1")
    xyz = np.array([[0.0, 0.0, 10.0], [1.0, 2.0, 10.0]], np.float32)
    uv = project_pcl_to_image(xyz, T, P)
    np.testing.assert_array_equal(uv, [[320, 240], [330, 260]])
