"""Headline benchmark: frames/sec/chip, 320x320 5-task inference, EN-GDF-PN-S0.

Runs the full perception pipeline — EdgeNeXt + GhostDualFPN + RCNet fusion +
DecoupleHead + PointNet forward, detection decode + class-aware NMS — at
batch 1 in bf16 on one chip, mirroring the reference FPS convention
(nets/Achelous.py:111-116, README.md:115-116: RTX A4000 = 61.3 FPS for
EN-GDF-PN-S0).

TIMING METHODOLOGY (changed round 3): earlier rounds timed a Python
dispatch loop closed by jax.block_until_ready — but on the axon tunnel
block_until_ready returns at ENQUEUE, not completion (measured 2026-08-17:
40 chained 8192^3 bf16 matmuls "ready" in 0.13 ms = an impossible
56 PFLOP/s; 250 ms when completion is forced by a fetch = 89% of spec
peak), so those numbers were dispatch rates, not device throughput.  This
bench chains the full pipeline N times inside ONE jitted lax.fori_loop
with a data dependency on every input, forces completion by fetching a
scalar, and reports the slope between two chain lengths — which cancels
both the one-time fetch sync and the post-fetch degraded-dispatch
constant.  See utils/profiling.device_time_per_iter.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.models.achelous import create_model
from achelous_tpu.ops.postprocess import decode_outputs, non_max_suppression
from achelous_tpu.utils.profiling import _tiny_scalar, device_time_per_iter

BASELINE_FPS_A4000 = 61.3   # reference README.md:81 (EN-GDF-PN-S0, FPSg)


def main():
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", pc_model="pn",
                         resolution=320, dtype=jnp.bfloat16)
    model = create_model(cfg)
    rng = np.random.RandomState(0)
    r = cfg.resolution
    image = jnp.asarray(rng.rand(1, r, r, 3), jnp.bfloat16)
    # radar rides CHANNELS-FIRST [B,3,R,R]: the production layout — the
    # reference's npz stores [3,H,W] and feeds NCHW tensors
    # (utils/dataloader.py:157-158), predict.py loads it untransposed, and
    # the on-device splat emits CF natively (ops/radar_splat.py cf=True) —
    # so the CF-chained RCNet starts with NO entry relayout
    # (TRACE_SUMMARY_BS1.txt fusion.2223 + copy.1782/1785 ~5% of the frame).
    radar = jnp.asarray(rng.rand(1, 3, r, r), jnp.bfloat16)
    pc = jnp.asarray(rng.rand(1, cfg.pc_points, cfg.pc_channels), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), image, radar, pc)

    def step(carry):
        """One full inference; every input is perturbed by a function of the
        outputs so NO branch is loop-invariant (XLA hoists any input whose
        carry does not change — an earlier probe that perturbed only the
        image measured a model with the whole radar branch hoisted out)."""
        img, rad, p = carry
        det, sem, lane, pcseg = model.apply(variables, img, rad, p)
        decoded = decode_outputs(det, (r, r))
        dets = non_max_suppression(decoded, cfg.num_det, 0.35, 0.35)
        s = _tiny_scalar((dets, sem, lane, pcseg)) * jnp.float32(1e-12)
        return (img + s.astype(img.dtype), rad + s.astype(rad.dtype),
                p + s.astype(p.dtype))

    dt = device_time_per_iter(step, (image, radar, pc), n1=100, n2=500,
                              repeats=3)
    fps = 1.0 / dt
    print(json.dumps({"s_per_frame": dt}), file=sys.stderr)

    def fwd_step(carry):
        """Reference FPS convention: model forward ONLY — the reference's
        timed loop (nets/Achelous.py:111-116) runs `model(...)` with no
        decode, no NMS, and no device sync, so the A4000 baseline excludes
        postprocess.  The headline above keeps the full pipeline (strictly
        more work); this companion number is the apples-to-apples one."""
        img, rad, p = carry
        out = model.apply(variables, img, rad, p)
        s = _tiny_scalar(out) * jnp.float32(1e-12)
        return (img + s.astype(img.dtype), rad + s.astype(rad.dtype),
                p + s.astype(p.dtype))

    dt_fwd = device_time_per_iter(fwd_step, (image, radar, pc), n1=100,
                                  n2=500, repeats=3)
    fwd_fps = 1.0 / dt_fwd

    print(json.dumps({
        "metric": "EN-GDF-PN-S0 320x320 5-task inference "
                  "(fwd+decode+NMS, bs=1, bf16, fetch-forced device time)",
        "value": round(fps, 1),
        "unit": "fps/chip",
        "vs_baseline": round(fps / BASELINE_FPS_A4000, 2),
        "fwd_only_fps": round(fwd_fps, 1),
        "fwd_only_vs_baseline": round(fwd_fps / BASELINE_FPS_A4000, 2),
    }))


if __name__ == "__main__":
    # The axon tunnel occasionally reports UNAVAILABLE for minutes at a time
    # (observed 2026-08-17, ~19:40+ UTC); retry in a FRESH process (jax
    # caches a failed backend init for the life of the process) so a
    # transient outage at round end doesn't void the bench artifact.
    import os
    import time
    try:
        main()
    except Exception:
        attempt = int(os.environ.get("ACHELOUS_BENCH_ATTEMPT", "0"))
        if attempt >= 2:
            raise
        print(f"bench attempt {attempt + 1} failed; re-exec in 120 s",
              file=sys.stderr)
        time.sleep(120)
        os.environ["ACHELOUS_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
