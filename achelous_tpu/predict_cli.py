"""Prediction CLI — the reference's predict.py mode switch (predict.py:23-141).

Modes: predict (single image), dir_predict, heatmap, export (StableHLO),
video (cv2 frame loop), fps (test_interval latency probe).  The reference
advertises 'video' and 'fps' in its mode assertion (predict.py:141) and
documents their knobs (predict.py:33-52) but this snapshot ships no branch
for either — they are implemented here to the documented semantics.

  python -m achelous_tpu.predict_cli --mode predict --image img.jpg \\
      --radar_csv r.csv --ckpt logs/ckpt/best_epoch_weights
"""
from __future__ import annotations

import argparse
import json
import os


def build_parser():
    p = argparse.ArgumentParser(description="Achelous-TPU predictor")
    p.add_argument("--mode", default="predict",
                   choices=["predict", "dir_predict", "heatmap", "export",
                            "video", "fps"])
    p.add_argument("--backbone", default="en")
    p.add_argument("--neck", default="gdf")
    p.add_argument("--phi", default="S0")
    p.add_argument("--pc_model", default="pn")
    p.add_argument("--resolution", type=int, default=320)
    p.add_argument("--confidence", type=float, default=0.35)
    p.add_argument("--nms_iou", type=float, default=0.35)
    p.add_argument("--image", default="")
    p.add_argument("--image_dir", default="")
    p.add_argument("--radar_npz", default="")
    p.add_argument("--radar_csv", default="")
    p.add_argument("--ckpt", default="", help="orbax checkpoint to load")
    p.add_argument("--weights", default="",
                   help="msgpack weights file (e.g. from "
                        "tools/import_torch_weights.py); torch-transplant "
                        "stamps auto-select the exact deform path")
    p.add_argument("--deform_band", default="auto",
                   help="deformable-conv offset band: 'auto' (config "
                        "default, or exact for stamped torch transplants), "
                        "'none' (exact unbounded-offset gather), or an "
                        "integer cell radius")
    p.add_argument("--deploy", action="store_true",
                   help="fold reparameterizable blocks before compiling")
    p.add_argument("--out", default="export_results")
    # video mode (reference predict.py:33-44)
    p.add_argument("--video", default="", help="input video path")
    p.add_argument("--video_out", default="", help="annotated output path"
                   " (empty = don't save, reference video_save_path='')")
    p.add_argument("--video_fps", type=float, default=0.0,
                   help="output fps (0 = inherit from the input)")
    p.add_argument("--max_frames", type=int, default=0,
                   help="stop after N frames (0 = all)")
    # fps mode (reference predict.py:46-52)
    p.add_argument("--test_interval", type=int, default=100,
                   help="detections per fps measurement")
    return p


def parse_band(value: str):
    """'auto' -> sentinel (config default / provenance auto-select),
    'none' -> None (exact gather), else int cell radius."""
    v = str(value).strip().lower()
    if v == "auto":
        return "auto"
    if v in ("none", "null", "off"):
        return None
    return int(v)


def load_predictor(args):
    import jax
    import jax.numpy as jnp

    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.predict import AchelousPredictor
    band = parse_band(args.deform_band)
    cfg_kw = {} if band == "auto" else {"deform_band": band}
    cfg = AchelousConfig(backbone=args.backbone, neck=args.neck, phi=args.phi,
                         pc_model=args.pc_model, resolution=args.resolution,
                         dtype=jnp.bfloat16, **cfg_kw)
    if args.weights:
        # msgpack weights honor their provenance stamp: torch transplants
        # auto-select deform_band=None unless --deform_band was explicit
        return AchelousPredictor.from_weights(
            cfg, args.weights, force_band=(band != "auto"),
            confidence=args.confidence, nms_iou=args.nms_iou,
            deploy=args.deploy)
    variables = None
    if args.ckpt:
        from achelous_tpu.models.achelous import create_model, example_inputs
        from achelous_tpu.train.checkpoints import CheckpointManager
        from achelous_tpu.train.train_state import (TrainConfig,
                                                    create_train_state)
        model = create_model(cfg)
        tmpl = create_train_state(model, cfg, TrainConfig(),
                                  jax.random.PRNGKey(0),
                                  example_inputs(cfg, 1))
        state = CheckpointManager(os.path.dirname(args.ckpt)).restore(
            os.path.basename(args.ckpt), tmpl)
        variables = {"params": state.ema_params,
                     "batch_stats": state.ema_batch_stats}
    return AchelousPredictor(cfg, variables, args.confidence,
                             args.nms_iou, deploy=args.deploy)


def run_one(pred, args, image_path, out_dir):
    from PIL import Image
    import numpy as np
    img = Image.open(image_path)
    r = pred.detect(img, radar_npz=args.radar_npz or None,
                    radar_csv=args.radar_csv or None)
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(image_path))[0]
    summary = {
        "image": image_path,
        "num_detections": int(len(r["boxes"])),
        "detections": [
            {"box": b.tolist(), "score": float(s),
             "class": pred.class_names[int(c)] if int(c) < len(pred.class_names)
             else int(c)}
            for b, s, c in zip(r["boxes"], r["scores"], r["classes"])],
        "drivable_pixels": int((r["drivable"] == 8).sum()),
        "waterline_pixels": int((r["waterline"] > 0).sum()),
    }
    with open(os.path.join(out_dir, stem + ".json"), "w") as f:
        json.dump(summary, f, indent=1)
    np.savez_compressed(os.path.join(out_dir, stem + "_masks.npz"),
                        semantic=r["semantic"].astype(np.uint8),
                        waterline=r["waterline"].astype(np.uint8))
    from achelous_tpu.visualize import render_detection
    render_detection(img, r, pred.class_names).save(
        os.path.join(out_dir, stem + "_vis.jpg"))
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "detections"}))
    return summary


def main(argv=None):
    args = build_parser().parse_args(argv)
    pred = load_predictor(args)
    if args.mode == "predict":
        run_one(pred, args, args.image, args.out)
    elif args.mode == "dir_predict":
        for name in sorted(os.listdir(args.image_dir)):
            if name.lower().endswith((".jpg", ".jpeg", ".png")):
                run_one(pred, args, os.path.join(args.image_dir, name),
                        args.out)
    elif args.mode == "heatmap":
        from PIL import Image
        import numpy as np
        hm = pred.detect_heatmap(Image.open(args.image),
                                 radar_npz=args.radar_npz or None,
                                 radar_csv=args.radar_csv or None)
        os.makedirs(args.out, exist_ok=True)
        out = os.path.join(args.out, "heatmap.npy")
        np.save(out, hm)
        print(json.dumps({"heatmap": out, "max": float(hm.max())}))
    elif args.mode == "export":
        from achelous_tpu.predict import export_stablehlo
        os.makedirs(args.out, exist_ok=True)
        path = export_stablehlo(pred, os.path.join(args.out, "achelous.shlo"))
        print(json.dumps({"exported": path,
                          "bytes": os.path.getsize(path)}))
    elif args.mode == "video":
        print(json.dumps(run_video(pred, args)))
    elif args.mode == "fps":
        print(json.dumps(run_fps_probe(pred, args)))


def run_video(pred, args) -> dict:
    """cv2 frame loop: detect every frame, draw, write the annotated video
    (the reference's documented-but-unshipped 'video' mode,
    predict.py:33-44: video_path -> detect_image per frame -> fps overlay ->
    optional VideoWriter at video_fps)."""
    import time

    import cv2
    import numpy as np
    from PIL import Image

    from achelous_tpu.visualize import render_detection

    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise ValueError(f"could not open video {args.video!r}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    writer = None
    n, t_total = 0, 0.0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        pil = Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        t0 = time.perf_counter()
        r = pred.detect(pil, radar_npz=args.radar_npz or None,
                        radar_csv=args.radar_csv or None)
        dt = time.perf_counter() - t0
        t_total += dt
        n += 1
        vis = render_detection(pil, r, pred.class_names)
        out = cv2.cvtColor(np.asarray(vis.convert("RGB")), cv2.COLOR_RGB2BGR)
        cv2.putText(out, f"fps= {1.0 / max(dt, 1e-9):.2f}", (0, 40),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 255, 0), 2)
        if args.video_out:
            if writer is None:
                h, w = out.shape[:2]
                writer = cv2.VideoWriter(
                    args.video_out, cv2.VideoWriter_fourcc(*"mp4v"),
                    args.video_fps or src_fps, (w, h))
            writer.write(out)
        if args.max_frames and n >= args.max_frames:
            break
    cap.release()
    if writer is not None:
        writer.release()
    return {"frames": n, "video_out": args.video_out or None,
            "mean_detect_s": round(t_total / max(n, 1), 4),
            "mean_fps": round(n / t_total, 2) if t_total else None}


def run_fps_probe(pred, args) -> dict:
    """The reference's 'fps' mode (predict.py:46-52): run the full detect
    pipeline test_interval times on one image and report seconds/image.
    Each call fetches results to host, so this measures true synchronous
    end-to-end latency (preprocess + forward + decode + NMS + unmap),
    mirroring the reference get_FPS convention of timing whole detections."""
    import time

    from PIL import Image

    img = Image.open(args.image)
    kw = dict(radar_npz=args.radar_npz or None,
              radar_csv=args.radar_csv or None)
    pred.detect(img, **kw)                      # warmup / compile
    t0 = time.perf_counter()
    for _ in range(args.test_interval):
        pred.detect(img, **kw)
    dt = (time.perf_counter() - t0) / args.test_interval
    return {"test_interval": args.test_interval,
            "seconds_per_image": round(dt, 5),
            "fps": round(1.0 / dt, 2)}


if __name__ == "__main__":
    main()
