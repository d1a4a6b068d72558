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


class TestTransplantBandAutoSelect:
    """Torch-transplanted weights must be evaluated on the exact
    unbounded-offset gather without manual flags: trained reference offsets
    exceed the banded default on 17.9% of taps (OFFSET_DISTRIBUTION.json),
    so the banded path silently diverges from torchvision semantics
    (reference conv_utils/dcn.py:56-63).  VERDICT r4 weak 5."""

    @pytest.fixture(scope="class")
    def stamped_weights(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.import_torch_weights import save_variables
        from achelous_tpu.models.achelous import create_model, example_inputs
        cfg = AchelousConfig(resolution=64, pc_points=16)
        model = create_model(cfg)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        *example_inputs(cfg, 1))
        d = tmp_path_factory.mktemp("weights")
        stamped = str(d / "transplant.msgpack")
        plain = str(d / "plain.msgpack")
        save_variables(variables, stamped,
                       meta={"provenance": "torch-transplant",
                             "deform_band": "none"})
        save_variables(variables, plain)
        return stamped, plain

    def _predictor(self, argv):
        from achelous_tpu.predict_cli import build_parser, load_predictor
        return load_predictor(build_parser().parse_args(argv))

    def test_cli_transplant_takes_exact_path(self, stamped_weights):
        stamped, _ = stamped_weights
        pred = self._predictor(["--resolution", "64",
                                "--weights", stamped])
        assert pred.cfg.deform_band is None

    def test_cli_explicit_band_overrides_stamp(self, stamped_weights):
        stamped, _ = stamped_weights
        pred = self._predictor(["--resolution", "64", "--weights", stamped,
                                "--deform_band", "4"])
        assert pred.cfg.deform_band == 4

    def test_cli_unstamped_keeps_default_band(self, stamped_weights):
        _, plain = stamped_weights
        pred = self._predictor(["--resolution", "64", "--weights", plain])
        assert pred.cfg.deform_band == 4

    def test_cli_band_none_flag(self, stamped_weights):
        _, plain = stamped_weights
        pred = self._predictor(["--resolution", "64", "--weights", plain,
                                "--deform_band", "none"])
        assert pred.cfg.deform_band is None

    def test_load_weights_meta_roundtrip(self, stamped_weights):
        from achelous_tpu.predict import load_weights
        stamped, plain = stamped_weights
        v, meta = load_weights(stamped)
        assert meta["provenance"] == "torch-transplant"
        assert "params" in v and "__achelous_meta__" not in v
        v2, meta2 = load_weights(plain)
        assert meta2 == {} and "params" in v2

    def test_train_cli_band_flag_parses(self):
        from achelous_tpu.train.cli import build_parser
        from achelous_tpu.predict_cli import parse_band
        args = build_parser().parse_args(
            ["--data_root", "/tmp", "--deform_band", "none"])
        assert parse_band(args.deform_band) is None
        args = build_parser().parse_args(["--data_root", "/tmp"])
        assert parse_band(args.deform_band) == "auto"
