"""Train state and the jitted multi-task train step.

Replaces the reference's fit_one_epoch inner loop (utils/utils_fit.py:15-203)
with one pure SPMD-friendly function: forward (4 tasks) -> losses (SimOTA det,
focal/CE+dice seg x2, NLL pc) -> uncertainty-weighted total -> grads -> SGD ->
EMA.  BatchNorm statistics are computed over the GLOBAL (sharded) batch axis —
under GSPMD the cross-device mean IS sync-BN (reference train.py:404-407).

Deliberate fixes vs the reference (SURVEY.md §7 "parity trivia"):
  * HUncertainty log_vars are persistent trainable parameters
    (fresh-per-step in the reference, utils_fit.py:99,145 — never trained);
  * the pc NLL consumes the model's log-probs once (double log-softmax over
    the wrong dim at utils_fit.py:125);
  * layer-scale/temperature params are actually trained (the reference's
    param grouping at train.py:500-513 silently drops any parameter not
    named .weight/.bias from the optimizer).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import flax
import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.losses.detection import YoloXLoss
from achelous_tpu.losses.multitask import uncertainty_weighted
from achelous_tpu.losses.segmentation import (ce_loss, dice_loss, focal_loss,
                                              pc_nll_loss)
from achelous_tpu.train.ema import ema_update


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference train.py flags (train.py:35-57)."""
    batch_size: int = 32
    epochs: int = 100
    lr_init: float = 0.03
    lr_decay: str = "cos"            # cos | step
    optimizer: str = "sgd"           # sgd | adam
    momentum: float = 0.937
    weight_decay: float = 5e-4
    focal: bool = True
    dice: bool = True
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    max_gt: int = 50                 # GT padding for static SimOTA shapes
    mtl: str = "sum"                 # sum | uncertainty | mgda | cagrad
                                     # 'sum' matches the reference's effective
                                     # behavior (its HUncertainty re-inits per
                                     # step -> unit weights; and the fp16 path
                                     # is a plain sum, utils_fit.py:152).
                                     # 'uncertainty' (trained log_vars)
                                     # down-weights the high-loss det task
                                     # early - use once tasks are balanced.
    freeze_epochs: int = 0           # freeze the vision backbone for the
                                     # first N epochs (reference Freeze_Train,
                                     # train.py:478-480)
    init_type: Optional[str] = None  # None = flax defaults (fan-in variance
                                     # scaling — our documented default); or
                                     # 'normal'/'xavier'/'kaiming'/'orthogonal'
                                     # for reference weights_init parity
                                     # (detection_loss.py:466-485, applied at
                                     # train.py:342 with type='normal')
    init_gain: float = 0.02
    grad_accum: int = 1              # micro-batch gradient accumulation: the
                                     # jitted step lax.scans A micro-batches
                                     # of B/A samples and applies ONE
                                     # optimizer/EMA update on the mean grad.
                                     # The XLA program is micro-batch-sized —
                                     # this is how the reference's bs=32
                                     # (train.py:151,159) trains through the
                                     # axon remote-compile helper, which 500s
                                     # on the monolithic bs=32 graph
                                     # (TRAIN_COMPILE_BISECT.json).  Same
                                     # semantics as torch-style accumulation:
                                     # BN moments are per-micro-batch and the
                                     # det loss normalizes per micro-batch.


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    epoch: jnp.ndarray               # completed epochs (explicit, so resume
                                     # survives dataset-size/batch-size change)
    params: Any
    log_vars: jnp.ndarray            # 3-task uncertainty weights
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    ema_updates: jnp.ndarray


def _wd_mask(params):
    """Decay only >=2D kernels (conv/dense); BN/LN scales, biases and
    layer-scale vectors are exempt (reference train.py:499-513 intent)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    if tcfg.optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(
                tcfg.weight_decay,
                mask=lambda g: {"model": _wd_mask(g["model"]),
                                "log_vars": False}),
            optax.sgd(learning_rate=1.0, momentum=tcfg.momentum,
                      nesterov=True),
        )
    else:
        # coupled L2 decay before the adam preconditioner, matching torch
        # Adam(weight_decay=...) applied to the weights group in the
        # reference's param grouping (train.py:499-513)
        opt = optax.chain(
            optax.add_decayed_weights(
                tcfg.weight_decay,
                mask=lambda g: {"model": _wd_mask(g["model"]),
                                "log_vars": False}),
            optax.scale_by_adam(b1=tcfg.momentum, b2=0.999),
            optax.scale(-1.0),
        )
    # lr is injected per-step via scale_by_learning_rate on a state field
    return opt


def create_train_state(model, cfg: AchelousConfig, tcfg: TrainConfig,
                       rng, sample_inputs) -> TrainState:
    variables = jax.jit(partial(model.init, train=False))(rng, *sample_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if tcfg.init_type is not None:
        from achelous_tpu.core.init import weights_init
        params = weights_init(params, batch_stats,
                              jax.random.fold_in(rng, 0x1717),
                              tcfg.init_type, tcfg.init_gain)
    opt = make_optimizer(tcfg)
    trainable = {"model": params, "log_vars": jnp.zeros(3, jnp.float32)}
    opt_state = opt.init(trainable)
    return TrainState(
        step=jnp.zeros((), jnp.int32), epoch=jnp.zeros((), jnp.int32),
        params=params,
        log_vars=jnp.zeros(3, jnp.float32), batch_stats=batch_stats,
        opt_state=opt_state, ema_params=params, ema_batch_stats=batch_stats,
        ema_updates=jnp.zeros((), jnp.int32))


def compute_losses(cfg: AchelousConfig, tcfg: TrainConfig, det_loss_fn,
                   outputs, batch):
    det, sem, lane, pc = outputs
    loss_det = det_loss_fn(det, batch["gt_boxes"], batch["gt_classes"],
                           batch["gt_mask"])
    seg_fn = focal_loss if tcfg.focal else ce_loss
    loss_seg = seg_fn(sem, batch["seg_labels"], None, cfg.num_seg)
    loss_wl = seg_fn(lane, batch["wl_labels"], None, 2)
    if tcfg.dice:
        loss_seg = loss_seg + dice_loss(sem, batch["seg_onehot"])
        loss_wl = loss_wl + dice_loss(lane, batch["wl_onehot"])
    loss_pc = pc_nll_loss(pc, batch["pc_labels"])
    return loss_seg, loss_wl, loss_det, loss_pc


def make_train_step(model, cfg: AchelousConfig, tcfg: TrainConfig
                    ) -> Callable[[TrainState, dict, jnp.ndarray],
                                  tuple[TrainState, dict]]:
    """Returns train_step(state, batch, lr) -> (state, metrics).

    batch keys: image [B,H,W,3], radar [B,H,W,3], pc [B,N,C],
    gt_boxes [B,G,4] (cxcywh pixels), gt_classes [B,G], gt_mask [B,G],
    seg_labels [B,H,W] int (ignore=num_seg), seg_onehot [B,H,W,num_seg+1],
    wl_labels [B,H,W], wl_onehot [B,H,W,3], pc_labels [B,N].
    """
    det_loss_fn = YoloXLoss(cfg.num_det)
    opt = make_optimizer(tcfg)

    def loss_fn(trainable, batch_stats, batch):
        outputs, mutated = model.apply(
            {"params": trainable["model"], "batch_stats": batch_stats},
            batch["image"], batch["radar"], batch["pc"], train=True,
            mutable=["batch_stats", "intermediates"])
        loss_seg, loss_wl, loss_det, loss_pc = compute_losses(
            cfg, tcfg, det_loss_fn, outputs, batch)
        if tcfg.mtl == "uncertainty":
            total = uncertainty_weighted(
                [loss_seg, loss_wl, loss_det], trainable["log_vars"]) + loss_pc
        else:   # plain sum (the reference fp16 3-task branch, utils_fit.py:152)
            total = loss_seg + loss_wl + loss_det + loss_pc
        metrics = {"loss": total, "loss_det": loss_det, "loss_seg": loss_seg,
                   "loss_wl": loss_wl, "loss_pc": loss_pc}
        return total, (mutated["batch_stats"], metrics)

    def surgery_grads(trainable, batch_stats, batch):
        """Per-task grads combined by MGDA / CAGrad (reference loss/mgda.py,
        loss/CAGrad.py — pure-JAX solvers, see losses/multitask.py).

        One forward, 4 pullbacks via jacrev over the stacked task losses.
        """
        from achelous_tpu.losses.multitask import (cagrad_combine,
                                                   mgda_combine)

        def stacked_losses(tr):
            outputs, mutated = model.apply(
                {"params": tr["model"], "batch_stats": batch_stats},
                batch["image"], batch["radar"], batch["pc"], train=True,
                mutable=["batch_stats", "intermediates"])
            ls, lw, ld, lp = compute_losses(cfg, tcfg, det_loss_fn, outputs,
                                            batch)
            losses = jnp.stack([ls, lw, ld, lp])
            return losses, (mutated["batch_stats"],
                            {"loss": jnp.sum(losses), "loss_det": ld,
                             "loss_seg": ls, "loss_wl": lw, "loss_pc": lp})

        # one forward, four unrolled pullbacks (jax.vjp). NB: jacrev's
        # vmapped pullback produces NaN grads on the TPU backend in bf16;
        # the unrolled form is numerically identical to 4x jax.grad.
        losses_out, vjp_fn, (new_bs, metrics) = jax.vjp(
            stacked_losses, trainable, has_aux=True)
        rows = []
        for i in range(4):
            ct = jnp.zeros(4, losses_out.dtype).at[i].set(1.0)
            g_i = vjp_fn(ct)[0]["model"]
            flat_i, unravel = jax.flatten_util.ravel_pytree(g_i)
            rows.append(flat_i)
        task_grads = jnp.stack(rows)
        losses = jnp.stack([metrics["loss_seg"], metrics["loss_wl"],
                            metrics["loss_det"], metrics["loss_pc"]])
        if tcfg.mtl == "mgda":
            combined = mgda_combine(task_grads, "l2", losses)
        else:
            combined = cagrad_combine(task_grads)
        grads = {"model": unravel(combined),
                 "log_vars": jnp.zeros_like(trainable["log_vars"])}
        return grads, (new_bs, metrics)

    def accum_grads(trainable, batch_stats, batch):
        """lax.scan over grad_accum micro-batches: mean grad + mean metrics,
        BN stats threaded sequentially (each micro forward updates them, the
        torch accumulation semantics).  The compiled program contains ONE
        micro-batch-sized fwd+bwd — see TrainConfig.grad_accum."""
        a = tcfg.grad_accum
        b = batch["image"].shape[0]
        if b % a:
            raise ValueError(f"batch size {b} not divisible by "
                             f"grad_accum {a}")
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(a, b // a, *x.shape[1:]), batch)
        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), trainable)
        zero_m = {k: jnp.zeros((), jnp.float32) for k in
                  ("loss", "loss_det", "loss_seg", "loss_wl", "loss_pc")}

        def body(carry, mb):
            acc_g, bs_state, acc_m = carry
            g, (new_bs, m) = jax.grad(loss_fn, has_aux=True)(
                trainable, bs_state, mb)
            acc_g = jax.tree_util.tree_map(
                lambda s, x: s + x.astype(jnp.float32), acc_g, g)
            acc_m = {k: acc_m[k] + m[k].astype(jnp.float32) for k in acc_m}
            return (acc_g, new_bs, acc_m), None

        (acc_g, new_bs, acc_m), _ = jax.lax.scan(
            body, (zero_g, batch_stats, zero_m), micro)
        inv = jnp.float32(1.0 / a)
        grads = jax.tree_util.tree_map(lambda g: g * inv, acc_g)
        metrics = {k: v * inv for k, v in acc_m.items()}
        return grads, (new_bs, metrics)

    def train_step(state: TrainState, batch: dict, lr: jnp.ndarray,
                   freeze_backbone: jnp.ndarray | bool = False):
        trainable = {"model": state.params, "log_vars": state.log_vars}
        if tcfg.mtl in ("mgda", "cagrad"):
            if tcfg.grad_accum > 1:
                raise NotImplementedError(
                    "grad_accum requires per-micro-batch task-grad "
                    "accumulation under mgda/cagrad; use mtl=sum/uncertainty")
            grads, (new_bs, metrics) = surgery_grads(trainable,
                                                     state.batch_stats, batch)
        elif tcfg.grad_accum > 1:
            grads, (new_bs, metrics) = accum_grads(trainable,
                                                   state.batch_stats, batch)
        else:
            grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
                trainable, state.batch_stats, batch)
        # Failure detection (SURVEY §5: the reference ships none): ONE
        # non-finite loss or gradient — a diverged SimOTA cost, a bf16
        # overflow in the backward — would otherwise poison params, EMA and
        # BN stats silently and permanently.  Compute the update, then keep
        # the old state wherever the step is not finite; torch's GradScaler
        # skips optimizer.step() the same way on inf/nan grads.
        grad_norm = optax.global_norm(grads)
        step_ok = jnp.isfinite(metrics["loss"]) & jnp.isfinite(grad_norm)
        updates, new_opt = opt.update(grads, state.opt_state, trainable)
        # the optimizer is built with lr=1.0; apply the per-epoch lr here
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        if "backbone" in updates["model"]:
            gate = 1.0 - jnp.asarray(freeze_backbone, jnp.float32)
            updates["model"]["backbone"] = jax.tree_util.tree_map(
                lambda u: u * gate, updates["model"]["backbone"])
        new_trainable = optax.apply_updates(trainable, updates)
        upd = state.ema_updates + 1
        new_state = state.replace(
            step=state.step + 1, params=new_trainable["model"],
            log_vars=new_trainable["log_vars"], batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=ema_update(state.ema_params, new_trainable["model"],
                                  upd, tcfg.ema_decay, tcfg.ema_tau),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_bs, upd,
                                       tcfg.ema_decay, tcfg.ema_tau),
            ema_updates=upd)
        skipped = state.replace(step=state.step + 1)
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(step_ok, n, o), new_state, skipped)
        metrics["lr"] = lr
        metrics["grad_norm"] = grad_norm
        metrics["skipped_nonfinite"] = 1.0 - step_ok.astype(jnp.float32)
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg: AchelousConfig, tcfg: TrainConfig):
    """Validation losses with frozen BN (reference utils_fit.py:216-309)."""
    det_loss_fn = YoloXLoss(cfg.num_det)

    def eval_step(state: TrainState, batch: dict):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], batch["radar"], batch["pc"], train=False)
        loss_seg, loss_wl, loss_det, loss_pc = compute_losses(
            cfg, tcfg, det_loss_fn, outputs, batch)
        return {"loss": loss_seg + loss_wl + loss_det + loss_pc,
                "loss_det": loss_det, "loss_seg": loss_seg,
                "loss_wl": loss_wl, "loss_pc": loss_pc}

    return eval_step
