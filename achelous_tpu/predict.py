"""Inference wrapper — the reference's `achelous` class + predict.py modes.

reference achelous.py:116-655 (detect_image :182-449, detect_heatmap
:451-555, get_map_txt :595) and predict.py:23-141.  One jitted program runs
forward + decode + NMS + seg softmax; letterbox unmapping and drawing stay on
host.  The reference min-max normalizes the radar map at predict time only
(achelous.py:212 — its train path feeds raw maps); that inconsistency breaks
detections of train-consistent checkpoints, so it is opt-in (`minmax_radar`).
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.data.waterscenes import (PC_FEATURES, SPLAT_FEATURES,
                                           letterbox, load_radar_csv,
                                           preprocess_image,
                                           resample_pointcloud)
from achelous_tpu.models.achelous import create_model
from achelous_tpu.ops.postprocess import (decode_outputs, non_max_suppression,
                                          yolo_correct_boxes)
from achelous_tpu.ops.radar_splat import minmax_normalize, splat_radar_fast

# WaterScenes benchmark classes (model_data/waterscenes_benchmark.txt)
DEFAULT_CLASS_NAMES = ("pier", "buoy", "sailor", "ship", "boat", "vessel",
                       "kayak")

# provenance stamp key inside msgpack weight files
# (tools/import_torch_weights.save_variables)
META_KEY = "__achelous_meta__"


def load_weights(path: str) -> Tuple[dict, dict]:
    """Restore a msgpack weights file -> (variables, meta).

    `meta` is the provenance stamp written by tools/import_torch_weights
    (empty dict for unstamped files).  meta["provenance"] ==
    "torch-transplant" means the weights were trained with UNBOUNDED deform
    offsets (torchvision deform_conv2d, reference conv_utils/dcn.py:56-63);
    evaluating them through the banded fast path silently clips 17.9% of
    trained taps (OFFSET_DISTRIBUTION.json), so loaders must select
    deform_band=None.  `from_weights` below does this automatically."""
    from flax import serialization
    with open(path, "rb") as f:
        doc = serialization.msgpack_restore(f.read())
    meta = doc.pop(META_KEY, {}) if isinstance(doc, dict) else {}
    return doc, dict(meta)


class AchelousPredictor:
    """Jitted end-to-end inference for one Achelous config."""

    def __init__(self, cfg: AchelousConfig, variables: Optional[dict] = None,
                 confidence: float = 0.35, nms_iou: float = 0.35,
                 max_det: int = 100, class_names=DEFAULT_CLASS_NAMES,
                 rng_seed: int = 0, deploy: bool = False,
                 minmax_radar: bool = False):
        """`deploy=True` folds all reparameterizable blocks (RepVGG /
        MobileOne / RepMixer / ...) into single convs before compiling — the
        reference's eval-time reparameterize path (utils/callbacks.py:150-160,
        nets/Achelous.py:86-95) as a pure param transform."""
        self.cfg = cfg
        self.confidence = confidence
        self.nms_iou = nms_iou
        self.class_names = class_names
        # The reference min-maxes the radar map at predict time only
        # (achelous.py:212) while TRAINING feeds raw maps — an inconsistency
        # that measurably destroys detections of a train-consistent model, so
        # it is opt-in here (enable for strict reference-predict parity).
        self.minmax_radar = minmax_radar
        self.model = create_model(cfg, deploy=deploy)
        if deploy and variables is not None:
            from achelous_tpu.core.reparam import reparameterize
            variables = reparameterize(variables)
        if variables is None and deploy:
            # init the train-form model, then fold — matches real usage
            train_model = create_model(cfg, deploy=False)
            r = cfg.resolution
            tv = jax.jit(train_model.init)(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, r, r, cfg.image_channels), cfg.dtype),
                jnp.zeros((1, r, r, cfg.radar_channels), cfg.dtype),
                jnp.zeros((1, cfg.pc_points, cfg.pc_channels), cfg.dtype))
            from achelous_tpu.core.reparam import reparameterize
            variables = reparameterize(tv)
        if variables is None:
            r = cfg.resolution
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, r, r, cfg.image_channels), cfg.dtype),
                jnp.zeros((1, r, r, cfg.radar_channels), cfg.dtype),
                jnp.zeros((1, cfg.pc_points, cfg.pc_channels), cfg.dtype))
        self.variables = variables
        r = cfg.resolution

        def _infer_fn(variables, image, radar, pc):
            det, sem, lane, pcseg = self.model.apply(variables, image, radar,
                                                     pc, train=False)
            decoded = decode_outputs(det, (r, r))
            dets = non_max_suppression(decoded, cfg.num_det, confidence,
                                       nms_iou, max_det)
            sem_prob = jax.nn.softmax(sem.astype(jnp.float32), -1)
            lane_prob = jax.nn.softmax(lane.astype(jnp.float32), -1)
            return dets, sem_prob, lane_prob, pcseg, det

        self._infer_fn = _infer_fn
        self._infer = jax.jit(_infer_fn)

    @classmethod
    def from_weights(cls, cfg: AchelousConfig, weights_path: str, **kwargs
                     ) -> "AchelousPredictor":
        """Build a predictor from a msgpack weights file, honoring its
        provenance stamp.

        Torch-transplanted checkpoints (tools/import_torch_weights.py) are
        auto-evaluated with `deform_band=None` — the exact unbounded-offset
        gather matching torchvision deform_conv2d semantics — because
        trained reference offsets exceed the banded default
        (OFFSET_DISTRIBUTION.json: p99 in the hundreds of cells; the clip
        would silently change 17.9% of taps).  Pass an explicit
        `deform_band=...` in cfg AND kwargs["force_band"]=True to override.
        """
        import dataclasses
        import logging
        variables, meta = load_weights(weights_path)
        force_band = kwargs.pop("force_band", False)
        if meta.get("provenance") == "torch-transplant" and not force_band \
                and cfg.deform_band is not None:
            logging.warning(
                "weights %s are a torch transplant (trained with unbounded "
                "deform offsets): overriding deform_band=%r -> None (exact "
                "gather).  Pass force_band=True to keep the banded path.",
                weights_path, cfg.deform_band)
            print(f"[achelous] torch-transplant weights: deform_band="
                  f"{cfg.deform_band!r} -> None (exact-gather parity path)",
                  flush=True)
            cfg = dataclasses.replace(cfg, deform_band=None)
        return cls(cfg, variables, **kwargs)

    def sharded_infer(self, mesh=None):
        """Data-parallel batched inference over a device mesh — the TPU-native
        replacement for the reference's `nn.DataParallel` inference wrap
        (achelous.py:176).

        Returns a jitted fn(variables, image[B, ...], radar[B, ...],
        pc[B, ...]) with the batch dim sharded over the mesh's axis and
        params replicated; XLA partitions the whole fwd+decode+NMS program
        so every chip runs its slice with no host round-trips.  B must be
        divisible by the mesh size.  Inference crosses no batch boundaries
        (eval-mode BN uses running stats; NMS is per-image), so outputs are
        identical to the single-device program (pinned in
        tests/test_host_sharding.py).

        The Pallas kernels stay live inside this program: a bare
        pallas_call carries no GSPMD partitioning rule, so the trace runs
        under a `pallas_batch_mesh` scope and each kernel call site wraps
        itself in `jax.shard_map` over the mesh's data axis — every chip
        runs the single-device kernel on its batch slice
        (core/kernels.shard_wrap; equality vs the single-device program
        pinned in tests/test_host_sharding.py).  Batches not divisible by
        the mesh fall back to the XLA kernel compositions automatically.
        """
        from achelous_tpu.core.kernels import pallas_batch_mesh
        from achelous_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                replicated)
        if mesh is None:
            mesh = make_mesh()
        rep, sh = replicated(mesh), batch_sharding(mesh)
        infer_fn = self._infer_fn

        def infer_sharded(variables, image, radar, pc):
            # the scope is read at trace time (core/kernels.pallas_default)
            with pallas_batch_mesh(mesh):
                return infer_fn(variables, image, radar, pc)

        return jax.jit(infer_sharded, in_shardings=(rep, sh, sh, sh),
                       out_shardings=sh)

    # -- input preparation ---------------------------------------------------
    def prepare_image(self, pil_image):
        img_l, _, _ = letterbox(pil_image.convert("RGB"),
                                (self.cfg.resolution, self.cfg.resolution))
        x = preprocess_image(np.asarray(img_l))
        return jnp.asarray(x, self.cfg.dtype)[None]

    def prepare_radar(self, npz_path: Optional[str] = None,
                      csv_path: Optional[str] = None):
        cfg = self.cfg
        # The radar map rides CHANNELS-FIRST end to end: the reference npz
        # stores [3, H, W] (radar_feature_map_generate.ipynb transpose) and
        # the model accepts CF natively (models/achelous.py radar_cf) — no
        # host transpose here and no [B,320,320,3] relayout on device
        # (TRACE_SUMMARY_BS1.txt fusion.2223).
        if npz_path and os.path.exists(npz_path):
            m = np.load(npz_path)["arr_0"].astype(np.float32)
        elif csv_path and os.path.exists(csv_path):
            pts = load_radar_csv(csv_path, SPLAT_FEATURES)
            n_real = min(len(pts), cfg.pc_points)
            pad = np.zeros((cfg.pc_points - n_real, 5), np.float32)
            pts = np.concatenate([pts[:n_real], pad])
            valid = np.arange(cfg.pc_points) < n_real
            m = np.asarray(splat_radar_fast(jnp.asarray(pts),
                                            jnp.asarray(valid),
                                            resolution=cfg.resolution,
                                            cf=True))
        else:
            m = np.zeros((cfg.radar_channels, cfg.resolution, cfg.resolution),
                         np.float32)
        if self.minmax_radar:
            m = np.asarray(minmax_normalize(jnp.asarray(m)))
        return jnp.asarray(m, cfg.dtype)[None]

    def prepare_pointcloud(self, csv_path: Optional[str]):
        cfg = self.cfg
        if csv_path and os.path.exists(csv_path):
            feats = load_radar_csv(csv_path, PC_FEATURES)
            pc, _ = resample_pointcloud(feats, None, cfg.pc_points,
                                        np.random.RandomState(0))
        else:
            pc = np.zeros((cfg.pc_points, cfg.pc_channels), np.float32)
        return jnp.asarray(pc, cfg.dtype)[None]

    # -- main entry ----------------------------------------------------------
    def detect(self, pil_image, radar_npz: Optional[str] = None,
               radar_csv: Optional[str] = None) -> Dict:
        """Full 5-task inference on one PIL image; returns host-side results
        in original-image coordinates (reference detect_image,
        achelous.py:182-449)."""
        cfg = self.cfg
        iw, ih = pil_image.size
        image = self.prepare_image(pil_image)
        radar = self.prepare_radar(radar_npz, radar_csv)
        pc = self.prepare_pointcloud(radar_csv)
        dets, sem_prob, lane_prob, pcseg, _ = self._infer(
            self.variables, image, radar, pc)

        valid = np.asarray(dets.valid[0])
        boxes_n = np.asarray(dets.boxes[0])[valid]
        scores = (np.asarray(dets.obj_conf[0]) *
                  np.asarray(dets.cls_conf[0]))[valid]
        classes = np.asarray(dets.cls_idx[0])[valid]
        boxes = yolo_correct_boxes(boxes_n, (cfg.resolution, cfg.resolution),
                                   (ih, iw), True) if len(boxes_n) else \
            np.zeros((0, 4), np.float32)

        sem = self._unletterbox_mask(np.asarray(sem_prob[0]), (ih, iw))
        lane = self._unletterbox_mask(np.asarray(lane_prob[0]), (ih, iw))
        sem_cls = sem.argmax(-1)
        # drivable-area extraction: keep only class 8 (achelous.py:297)
        drivable = np.where(sem_cls == 8, sem_cls, 0)
        return {"boxes": boxes, "scores": scores, "classes": classes,
                "semantic": sem_cls, "drivable": drivable,
                "waterline": lane.argmax(-1),
                "pc_pred": np.asarray(pcseg[0]).argmax(-1)}

    def _unletterbox_mask(self, prob: np.ndarray, image_hw) -> np.ndarray:
        """Crop gray bars and resize probabilities to the original image
        (achelous.py:283-318)."""
        r = self.cfg.resolution
        ih, iw = image_hw
        scale = min(r / ih, r / iw)
        nh, nw = int(ih * scale), int(iw * scale)
        top, left = (r - nh) // 2, (r - nw) // 2
        crop = prob[top:top + nh, left:left + nw]
        from achelous_tpu.ops.resize import resize_bilinear
        out = resize_bilinear(jnp.asarray(crop)[None], (ih, iw),
                              align_corners=False)[0]
        return np.asarray(out)

    def detect_heatmap(self, pil_image, radar_npz=None, radar_csv=None):
        """Per-level max(sigmoid(cls)) * sigmoid(obj) score maps, max-composited
        at input resolution (reference detect_heatmap, achelous.py:451-555)."""
        image = self.prepare_image(pil_image)
        radar = self.prepare_radar(radar_npz, radar_csv)
        pc = self.prepare_pointcloud(radar_csv)
        *_, det_maps = self._infer(self.variables, image, radar, pc)
        return np.asarray(_heatmap_composite(self.cfg.resolution)(det_maps))


@functools.lru_cache(maxsize=None)
def _heatmap_composite(resolution: int):
    """One jitted composite program per resolution (per-level map shapes are
    resolution-derived, so resolution fully keys the trace).

    Module-level cache: re-building jax.jit per detect_heatmap call would
    re-trace every call.  Jitted, NEVER eager ops: a single eager device op
    between jitted calls degrades all subsequent jit dispatch on the axon
    backend to a constant ~1.7 s (bisected 2026-08-17; see CLAUDE.md known
    backend bugs)."""
    r = resolution

    @jax.jit
    def composite_fn(maps):
        from achelous_tpu.ops.resize import resize_bilinear
        composite = jnp.zeros((r, r))
        for m in maps:
            m = m.astype(jnp.float32)
            score = (jax.nn.sigmoid(m[0, ..., 5:]).max(-1) *
                     jax.nn.sigmoid(m[0, ..., 4]))
            up = resize_bilinear(score[None, ..., None], (r, r),
                                 align_corners=False)[0, ..., 0]
            composite = jnp.maximum(composite, up)
        return composite

    return composite_fn


def export_stablehlo(predictor: AchelousPredictor, path: str) -> str:
    """Serialize the jitted inference function via jax.export — the TPU-native
    replacement for the reference's ONNX export (achelous.py:557-593)."""
    from jax import export as jexport
    from achelous_tpu.ops.postprocess import Detections
    try:
        jexport.register_namedtuple_serialization(
            Detections, serialized_name="achelous_tpu.Detections")
    except ValueError:
        pass  # already registered
    cfg = predictor.cfg
    r = cfg.resolution
    args = (jnp.zeros((1, r, r, cfg.image_channels), cfg.dtype),
            jnp.zeros((1, r, r, cfg.radar_channels), cfg.dtype),
            jnp.zeros((1, cfg.pc_points, cfg.pc_channels), cfg.dtype))
    fn = lambda i, rd, p: predictor._infer(predictor.variables, i, rd, p)
    exported = jexport.export(jax.jit(fn))(*args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path
