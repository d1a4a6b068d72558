"""Training orchestration: epoch loop, loss history, online eval callbacks.

Replaces reference train.py:637-703 + utils/utils_fit.py:15-381 + the four
eval callbacks (utils/callbacks.py:222-293, utils_seg/callbacks.py:194-248,
utils_seg_line/callbacks.py, utils_seg_pc/callbacks.py:177-237): one loop,
one jitted train step, metrics computed in memory (no txt/png exchange).
"""
from __future__ import annotations

import functools
import json
import os
import time
from typing import Callable, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.data.waterscenes import WaterScenesDataset, collate
from achelous_tpu.ops.postprocess import decode_outputs, non_max_suppression
from achelous_tpu.ops.radar_splat import splat_radar_fast
from achelous_tpu.train.checkpoints import CheckpointManager
from achelous_tpu.train.schedule import get_lr_scheduler, scale_lr
from achelous_tpu.train.train_state import (TrainConfig, TrainState,
                                            create_train_state,
                                            make_eval_step, make_train_step)
from achelous_tpu.utils.metrics import (compute_det_metrics, compute_miou,
                                        fast_hist, pc_mean_iou)


class LossHistory:
    """txt-appending loss log (reference utils/callbacks.py:21-83, one
    instance covered all four streams here)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.records: List[dict] = []

    def append(self, epoch: int, **metrics):
        rec = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()}}
        self.records.append(rec)
        with open(os.path.join(self.log_dir, "history.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        self.plot()

    def plot(self):
        """Loss-curve png (reference utils/callbacks.py:56-83, savgol
        smoothing replaced by a simple running mean), plus the per-epoch
        metric curves the reference EvalCallbacks plot: epoch_map.png
        (utils/callbacks.py:279-290) and epoch_miou.png for the three
        segmentation streams (utils_seg/callbacks.py:234-245,
        utils_seg_line/, utils_seg_pc/ — one figure here instead of three
        log dirs).  Metric keys exist only on eval epochs (eval_period), so
        each series plots the epochs where its key is present."""
        if len(self.records) < 2:
            return
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return

        def save_series(fname, ylabel, series):
            """series: (key, label, color) triples; skips absent keys."""
            drawn = False
            fig, ax = plt.subplots(figsize=(7, 4))
            for key, label, color in series:
                pts = [(r["epoch"], r[key]) for r in self.records
                       if r.get(key) is not None]
                if len(pts) >= 1:
                    ax.plot(*zip(*pts), color=color, label=label,
                            linewidth=2, marker="o", markersize=3)
                    drawn = True
            if drawn:
                ax.set_xlabel("epoch"); ax.set_ylabel(ylabel)
                ax.grid(True); ax.legend()
                fig.savefig(os.path.join(self.log_dir, fname),
                            bbox_inches="tight")
            plt.close(fig)

        save_series("epoch_loss.png", "loss",
                    [("loss", "loss", "red"),
                     ("val_loss", "val_loss", "coral")])
        save_series("epoch_map.png", "mAP",
                    [("mAP50", "mAP50", "red"),
                     ("mAP50-95", "mAP50-95", "coral")])
        save_series("epoch_miou.png", "mIoU",
                    [("miou_sem", "semantic", "red"),
                     ("miou_wl", "waterline", "royalblue"),
                     ("miou_pc", "point cloud", "seagreen")])


def batches_from(dataset: WaterScenesDataset, cfg: AchelousConfig,
                 batch_size: int, max_gt: int, shuffle: bool,
                 rng: np.random.RandomState,
                 drop_last: bool = True,
                 sampler=None, epoch: int = 0) -> Iterable[dict]:
    """Static-shape batches. drop_last=True matches the reference DataLoaders
    (train.py:589-603 set drop_last=True for both train and val-loss gens).
    With drop_last=False the tail batch is padded to batch_size by wrapping
    around; `n_valid` marks how many leading samples are real and `indices`
    carries the dataset indices — eval loops score only the real ones, so
    every sample is seen exactly once (the reference EvalCallback scores every
    image, utils/callbacks.py:222-265).

    Pass a data.sampler.DistributedSampler (+ the epoch) to iterate only this
    process's shard of a multi-host run (reference DistributedSampler,
    train.py:576-580); batch_size is then the PER-PROCESS batch."""
    if sampler is not None:
        idx = sampler.epoch_indices(epoch)
    else:
        idx = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(idx)
    end = len(idx) - batch_size + 1 if drop_last else len(idx)
    for s in range(0, max(end, 0 if drop_last else 1), batch_size):
        take = idx[s:s + batch_size]
        n_valid = len(take)
        if n_valid < batch_size:        # pad by cyclic wrapping (never scored)
            take = np.concatenate([take, np.resize(idx, batch_size - n_valid)])
        samples = [dataset[i] for i in take]
        batch = collate(samples, cfg, max_gt)
        batch["n_valid"] = n_valid
        batch["indices"] = take
        yield batch


_HOST_ONLY_KEYS = ("radar_points", "radar_points_valid", "n_valid", "indices")


@functools.lru_cache(maxsize=None)
def _batched_splat(resolution: int):
    """One jitted+vmapped radar-splat program per resolution.

    Module-level cache: building `jax.jit(jax.vmap(...))` per call re-traces
    (and can re-compile) the splat once per training batch — the default path
    whenever no pre-rasterized npz dir exists."""
    return jax.jit(jax.vmap(
        functools.partial(splat_radar_fast, resolution=resolution)))


def device_batch(batch: dict, cfg: AchelousConfig, mesh=None) -> dict:
    """Host batch -> device arrays; splat radar points on device if the
    batch carries raw points instead of pre-rasterized maps.

    With a mesh, every array is placed batch-sharded over the mesh's data
    axis — on multi-process runs each host contributes only its local shard
    (parallel/mesh.py:global_shard_batch), the SPMD replacement for the
    reference's per-rank DataLoader (train.py:576-603)."""
    if mesh is not None:
        from achelous_tpu.parallel.mesh import global_shard_batch
        place = lambda tree: global_shard_batch(tree, mesh)  # noqa: E731
    else:
        place = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)  # noqa: E731
    out = place({k: v for k, v in batch.items() if k not in _HOST_ONLY_KEYS})
    if "radar" not in out:
        pts = place({"p": batch["radar_points"],
                     "v": batch["radar_points_valid"]})
        out["radar"] = _batched_splat(cfg.resolution)(pts["p"], pts["v"])
    return out


def unletterbox_argmax(prob: np.ndarray, orig_hw: tuple[int, int]) -> np.ndarray:
    """Class-prob map at letterbox resolution -> label map at the original
    image resolution.

    Exactly the reference eval path (utils_seg/callbacks.py:169-186): crop
    the gray letterbox bars off the softmax probabilities, bilinear-resize
    the probs to the native size, then argmax.
    """
    from PIL import Image
    r = prob.shape[0]
    ih, iw = orig_hw
    scale = min(r / iw, r / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    dx, dy = (r - nw) // 2, (r - nh) // 2
    crop = np.ascontiguousarray(prob[dy:dy + nh, dx:dx + nw], np.float32)
    if (ih, iw) == (nh, nw):
        return np.argmax(crop, -1).astype(np.int32)
    chans = [np.asarray(Image.fromarray(crop[..., c], mode="F")
                        .resize((iw, ih), Image.BILINEAR))
             for c in range(crop.shape[-1])]
    return np.argmax(np.stack(chans, -1), -1).astype(np.int32)


def evaluate_epoch(model, cfg: AchelousConfig, state: TrainState,
                   dataset: WaterScenesDataset, batch_size: int = 8,
                   conf_thres: float = 0.02, nms_thres: float = 0.5,
                   use_ema: bool = True, class_names=None) -> dict:
    """Online eval: det mAP + semantic/waterline mIoU + pc mIoU over a val
    set (the reference's four EvalCallbacks, computed in memory).

    Fidelity notes:
      * every val image is scored exactly once (tail batch padded, padding
        masked out via n_valid — the reference EvalCallback also scores the
        full set, utils/callbacks.py:222-265);
      * seg/waterline mIoU is computed un-letterboxed at the original image
        resolution against the raw label pngs (utils_seg/callbacks.py:
        169-186), not at letterboxed input resolution;
      * detection mAP is computed in letterboxed pixel space — the letterbox
        map is the same uniform scale+offset for predictions and GTs, so
        every IoU (and hence mAP) is identical to original-space matching.
    """
    params = state.ema_params if use_ema else state.params
    stats = state.ema_batch_stats if use_ema else state.batch_stats
    r = cfg.resolution

    @jax.jit
    def infer(batch):
        det, sem, lane, pc = model.apply(
            {"params": params, "batch_stats": stats},
            batch["image"], batch["radar"], batch["pc"], train=False)
        decoded = decode_outputs(det, (r, r))
        dets = non_max_suppression(decoded, cfg.num_det, conf_thres,
                                   nms_thres)
        return (dets, jax.nn.softmax(sem.astype(jnp.float32), -1),
                jax.nn.softmax(lane.astype(jnp.float32), -1),
                jnp.argmax(pc, -1))

    all_dets, all_gts = [], []
    sem_hist = np.zeros((cfg.num_seg, cfg.num_seg), np.int64)
    wl_hist = np.zeros((2, 2), np.int64)
    pc_conf = np.zeros((cfg.pc_classes, cfg.pc_classes), np.int64)
    rng = np.random.RandomState(0)
    for batch in batches_from(dataset, cfg, batch_size, 50, False, rng,
                              drop_last=False):
        db = device_batch(batch, cfg)
        dets, sem_prob, wl_prob, pc_pred = jax.device_get(infer(db))
        for i in range(batch["n_valid"]):
            v = dets.valid[i]
            boxes = dets.boxes[i][v] * r          # pixel scale for matching
            all_dets.append({
                "boxes": boxes,
                "scores": (dets.obj_conf[i] * dets.cls_conf[i])[v],
                "classes": dets.cls_idx[i][v]})
            gm = batch["gt_mask"][i]
            gb = batch["gt_boxes"][i][gm]
            gt_xyxy = np.concatenate([gb[:, :2] - gb[:, 2:] / 2,
                                      gb[:, :2] + gb[:, 2:] / 2], -1)
            all_gts.append({"boxes": gt_xyxy,
                            "classes": batch["gt_classes"][i][gm]})
            seg_orig, wl_orig = dataset.original_masks(int(batch["indices"][i]))
            sem_hist += fast_hist(
                seg_orig.flatten(),
                unletterbox_argmax(sem_prob[i], seg_orig.shape).flatten(),
                cfg.num_seg)
            # labels == 2 are the ignore class; fast_hist drops out-of-range
            wl_hist += fast_hist(
                wl_orig.flatten(),
                unletterbox_argmax(wl_prob[i], wl_orig.shape).flatten(), 2)
            pc_conf += fast_hist(batch["pc_labels"][i].flatten(),
                                 pc_pred[i].flatten(), cfg.pc_classes)
    det_m = compute_det_metrics(all_dets, all_gts, cfg.num_det,
                                per_class=True)
    from achelous_tpu.utils.metrics import (per_class_iu,
                                            per_class_pa_recall,
                                            voc_per_class_table)
    out = {**det_m,
           "n_images": len(all_gts),
           "miou_sem": float(np.nanmean(per_class_iu(sem_hist))),
           "miou_wl": float(np.nanmean(per_class_iu(wl_hist))),
           "miou_pc": pc_mean_iou(pc_conf)}
    # per-class breakdowns, flattened to scalar keys so they reach
    # history.jsonl — the tables the reference prints per epoch:
    # per-class AP + LAMR (utils/utils_map.py:560-640) and per-class
    # IoU / PA (utils_seg/utils_metrics.py:47-60).
    def cname(i):
        return (class_names[i] if class_names and i < len(class_names)
                else f"c{i}")
    for c, ap in out.pop("per_class_ap50").items():
        out[f"ap50/{cname(c)}"] = ap
    out.pop("per_class_ap")
    for c, row in voc_per_class_table(all_dets, all_gts,
                                      cfg.num_det).items():
        out[f"lamr/{cname(c)}"] = row["lamr"]
    sem_iu, sem_pa = per_class_iu(sem_hist), per_class_pa_recall(sem_hist)
    for c in range(cfg.num_seg):
        out[f"iou_sem/{c}"] = float(sem_iu[c])
        out[f"pa_sem/{c}"] = float(sem_pa[c])
    for c, v in enumerate(per_class_iu(pc_conf)):
        out[f"iou_pc/{c}"] = float(v)
    return out


# Metric accumulation must be JITTED: a single eager device op between
# jitted steps degrades all subsequent jit dispatch on the axon TPU backend
# to a constant ~1.7 s/call (bisected 2026-08-17, see CLAUDE.md known
# backend bugs).
_metric_add = jax.jit(lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))


def fit(model, cfg: AchelousConfig, tcfg: TrainConfig,
        train_ds: WaterScenesDataset, val_ds: Optional[WaterScenesDataset],
        log_dir: str = "logs", epochs: Optional[int] = None,
        eval_period: int = 10, save_period: int = 10,
        state: Optional[TrainState] = None, seed: int = 0,
        mesh=None,
        progress: Callable[[str], None] = print) -> TrainState:
    """Full training run (reference train.py:637-703 + fit_one_epoch).

    Pass a `jax.sharding.Mesh` to train data-parallel: params are
    replicated, batches sharded over the mesh's data axis, and on
    multi-process (multi-host) runs each process loads only its
    DistributedSampler shard with tcfg.batch_size interpreted as the
    GLOBAL batch (reference DDP path, train.py:313-324, 576-580)."""
    from achelous_tpu.models.achelous import example_inputs
    epochs = epochs or tcfg.epochs
    if state is None:
        state = create_train_state(model, cfg, tcfg, jax.random.PRNGKey(seed),
                                   example_inputs(cfg, 2))
    sampler, local_bs = None, tcfg.batch_size
    if mesh is not None:
        from achelous_tpu.data.sampler import DistributedSampler
        from achelous_tpu.parallel.mesh import (local_batch_size,
                                                replicate_state)
        state = replicate_state(state, mesh)
        if jax.process_count() > 1:
            local_bs = local_batch_size(tcfg.batch_size, mesh)
            sampler = DistributedSampler(len(train_ds), seed=seed)
    init_lr, min_lr = scale_lr(tcfg.lr_init, tcfg.batch_size, tcfg.optimizer)
    lr_fn = get_lr_scheduler(tcfg.lr_decay, init_lr, min_lr, epochs)
    step_fn = make_train_step(model, cfg, tcfg)
    ev_fn = make_eval_step(model, cfg, tcfg)
    if mesh is not None and mesh.size > 1:
        # a bare pallas_call has no GSPMD partitioning rule; trace under a
        # pallas_batch_mesh scope so kernel call sites shard_map themselves
        # over the data axis and keep the Pallas kernels live per shard
        # (core/kernels.shard_wrap — same as sharded_infer)
        from achelous_tpu.core.kernels import pallas_batch_mesh

        def _on_mesh(fn):
            def wrapped(*a, **kw):
                with pallas_batch_mesh(mesh):
                    return fn(*a, **kw)
            return wrapped

        step_fn, ev_fn = _on_mesh(step_fn), _on_mesh(ev_fn)
    train_step = jax.jit(step_fn)
    eval_step = jax.jit(ev_fn)
    history = LossHistory(log_dir)
    ckpt = CheckpointManager(os.path.join(log_dir, "ckpt"))
    rng = np.random.RandomState(seed)

    # epoch is stored explicitly in the state (not inferred from step), so
    # resume is exact even if the dataset size or batch size changed
    for epoch in range(int(state.epoch), epochs):
        lr = jnp.float32(lr_fn(epoch))
        t0 = time.time()
        tr_metrics, n_b = None, 0
        freeze = jnp.asarray(epoch < tcfg.freeze_epochs)
        from achelous_tpu.data.prefetch import prefetch
        with prefetch(batches_from(train_ds, cfg, local_bs, tcfg.max_gt,
                                   True, rng, sampler=sampler, epoch=epoch),
                      depth=2) as batches:
            for batch in batches:
                state, m = train_step(state, device_batch(batch, cfg, mesh),
                                      lr, freeze)
                tr_metrics = m if tr_metrics is None else \
                    _metric_add(tr_metrics, m)
                n_b += 1
        tr = {k: float(v) / max(n_b, 1) for k, v in (tr_metrics or {}).items()}

        val = {}
        if val_ds is not None:
            val_sampler = None
            if sampler is not None:
                from achelous_tpu.data.sampler import DistributedSampler
                val_sampler = DistributedSampler(len(val_ds), shuffle=False)
            vm, n_v = None, 0
            for batch in batches_from(val_ds, cfg, local_bs,
                                      tcfg.max_gt, False, rng,
                                      sampler=val_sampler, epoch=epoch):
                m = eval_step(state, device_batch(batch, cfg, mesh))
                vm = m if vm is None else _metric_add(vm, m)
                n_v += 1
            val = {f"val_{k}": float(v) / max(n_v, 1) for k, v in (vm or {}).items()}
            if (epoch + 1) % eval_period == 0 or epoch == epochs - 1:
                val.update(evaluate_epoch(model, cfg, state, val_ds,
                                          batch_size=tcfg.batch_size))
        state = state.replace(epoch=jnp.int32(epoch + 1))
        history.append(epoch, **{"lr": float(lr), **tr, **val})
        ckpt.save_epoch(epoch, state, tr.get("loss", 0.0),
                        val.get("val_loss", tr.get("loss", 0.0)), save_period)
        progress(f"epoch {epoch + 1}/{epochs} "
                 f"loss={tr.get('loss', float('nan')):.3f} "
                 f"val={val.get('val_loss', float('nan')):.3f} "
                 f"({time.time() - t0:.1f}s)")
    return state
