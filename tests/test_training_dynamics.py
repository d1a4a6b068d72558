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
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", resolution=RES,
                         pc_points=NPTS)
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
    # re-convergence, which a genuinely different loss surface would fail
    assert (rel[:, 2] < 0.25).all(), f"det trajectory diverges: {rel[:, 2]}"
    assert rel[-3:, 2].mean() < 0.06, \
        f"det trajectories fail to re-converge: {rel[-3:, 2]}"
    # and both trainers actually learned the fixture
    assert jax_traj[-1].sum() < 0.75 * jax_traj[0].sum()
    assert torch_traj[-1].sum() < 0.75 * torch_traj[0].sum()
