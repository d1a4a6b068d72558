"""End-to-end predictor smoke (predict.py AchelousPredictor): letterbox ->
jitted 5-task inference -> NMS -> original-coordinate unmapping, heatmap,
deploy-mode folding, and the StableHLO export artifact (the reference's
predict.py/achelous.py surface, SURVEY.md §3.3)."""
import numpy as np
import pytest
from PIL import Image

from achelous_tpu.core.config import AchelousConfig


@pytest.fixture(scope="module")
def predictor():
    from achelous_tpu.predict import AchelousPredictor
    cfg = AchelousConfig(resolution=64, pc_points=16)
    return AchelousPredictor(cfg, confidence=0.01, nms_iou=0.5)


@pytest.fixture(scope="module")
def pil_img():
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8))


def test_detect_returns_original_coordinates(predictor, pil_img):
    out = predictor.detect(pil_img)
    assert out["semantic"].shape == (96, 128)       # original resolution
    assert out["waterline"].shape == (96, 128)
    assert out["drivable"].shape == (96, 128)
    # drivable mask keeps only class 8 (reference achelous.py:297)
    assert set(np.unique(out["drivable"])) <= {0, 8}
    assert out["pc_pred"].shape == (16,)
    n = len(out["boxes"])
    assert out["scores"].shape == (n,) and out["classes"].shape == (n,)
    if n:
        # boxes are (y1, x1, y2, x2)-agnostic but must be finite and within
        # a small margin of the original image frame
        assert np.isfinite(out["boxes"]).all()
        assert out["boxes"].min() > -64 and out["boxes"].max() < 192


def test_detect_heatmap_shape_and_range(predictor, pil_img):
    hm = predictor.detect_heatmap(pil_img)
    assert hm.shape == (64, 64)
    assert 0.0 <= hm.min() and hm.max() <= 1.0


def test_deploy_mode_predictor_runs(pil_img):
    """deploy=True folds RepVGG/MobileOne branches before compiling."""
    from achelous_tpu.predict import AchelousPredictor
    cfg = AchelousConfig(backbone="mo", neck="rdf", resolution=64,
                         pc_points=16)
    p = AchelousPredictor(cfg, confidence=0.01, deploy=True)
    out = p.detect(pil_img)
    assert out["semantic"].shape == (96, 128)


def test_cli_run_one_writes_artifacts(predictor, pil_img, tmp_path):
    """predict_cli.run_one: json summary + mask npz + rendered jpg
    (the reference predict.py 'predict' mode surface)."""
    import json

    from achelous_tpu import predict_cli

    img_path = str(tmp_path / "frame.jpg")
    pil_img.save(img_path)
    args = predict_cli.build_parser().parse_args(
        ["--image", img_path, "--out", str(tmp_path / "out")])
    summary = predict_cli.run_one(predictor, args, img_path,
                                  str(tmp_path / "out"))
    assert summary["num_detections"] == len(summary["detections"])
    saved = json.load(open(tmp_path / "out" / "frame.json"))
    assert saved["image"] == img_path
    masks = np.load(tmp_path / "out" / "frame_masks.npz")
    assert masks["semantic"].shape == (96, 128)
    assert (tmp_path / "out" / "frame_vis.jpg").exists()


def test_export_stablehlo_roundtrip(predictor, tmp_path):
    """The serialized artifact must reload and reproduce the jitted outputs
    (replaces the reference's convert_to_onnx, achelous.py:557-593)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from achelous_tpu.predict import export_stablehlo

    path = export_stablehlo(predictor, str(tmp_path / "model.stablehlo"))
    exported = jexport.deserialize((tmp_path / "model.stablehlo").read_bytes())

    cfg = predictor.cfg
    r = cfg.resolution
    rng = np.random.RandomState(1)
    args = (jnp.asarray(rng.rand(1, r, r, 3), cfg.dtype),
            jnp.asarray(rng.rand(1, r, r, 3), cfg.dtype),
            jnp.asarray(rng.rand(1, cfg.pc_points, cfg.pc_channels),
                        cfg.dtype))
    want = predictor._infer(predictor.variables, *args)
    got = exported.call(*args)
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_video_mode_annotates_frames(predictor, tmp_path):
    """predict_cli 'video' mode: reads a small mp4, detects per frame,
    writes the annotated video (reference predict.py:33-44 semantics)."""
    import cv2
    from achelous_tpu.predict_cli import build_parser, run_video

    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (128, 96))
    rng = np.random.RandomState(0)
    for _ in range(4):
        w.write(rng.randint(0, 255, (96, 128, 3), np.uint8))
    w.release()

    out = str(tmp_path / "out.mp4")
    args = build_parser().parse_args(
        ["--mode", "video", "--video", src, "--video_out", out,
         "--max_frames", "3"])
    res = run_video(predictor, args)
    assert res["frames"] == 3 and res["mean_fps"] > 0
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3
    cap.release()


def test_fps_probe_mode(predictor, pil_img, tmp_path):
    """predict_cli 'fps' mode: test_interval synchronous detections
    (reference predict.py:46-52)."""
    from achelous_tpu.predict_cli import build_parser, run_fps_probe

    p = str(tmp_path / "probe.jpg")
    pil_img.save(p)
    args = build_parser().parse_args(
        ["--mode", "fps", "--image", p, "--test_interval", "3"])
    res = run_fps_probe(predictor, args)
    assert res["test_interval"] == 3
    assert res["fps"] > 0 and res["seconds_per_image"] > 0
