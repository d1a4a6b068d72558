"""Headline benchmark: frames/sec/chip, 320x320 5-task inference, EN-GDF-PN-S0.

Runs the full perception pipeline — EdgeNeXt + GhostDualFPN + RCNet fusion +
DecoupleHead + PointNet forward, detection decode + class-aware NMS — at
batch 1 in bf16 on one chip, mirroring the reference FPS convention
(nets/Achelous.py:111-116, README.md:115-116: RTX A4000 = 61.3 FPS for
EN-GDF-PN-S0).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from achelous_tpu.core.config import AchelousConfig
from achelous_tpu.models.achelous import create_model
from achelous_tpu.ops.postprocess import decode_outputs, non_max_suppression

BASELINE_FPS_A4000 = 61.3   # reference README.md:81 (EN-GDF-PN-S0, FPSg)


def main():
    cfg = AchelousConfig(phi="S0", backbone="en", neck="gdf", pc_model="pn",
                         resolution=320, dtype=jnp.bfloat16)
    model = create_model(cfg)
    rng = np.random.RandomState(0)
    r = cfg.resolution
    image = jnp.asarray(rng.rand(1, r, r, 3), jnp.bfloat16)
    radar = jnp.asarray(rng.rand(1, r, r, 3), jnp.bfloat16)
    pc = jnp.asarray(rng.rand(1, cfg.pc_points, cfg.pc_channels), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), image, radar, pc)

    @jax.jit
    def infer(v, image, radar, pc):
        det, sem, lane, pcseg = model.apply(v, image, radar, pc)
        decoded = decode_outputs(det, (r, r))
        dets = non_max_suppression(decoded, cfg.num_det, 0.35, 0.35)
        return dets, sem, lane, pcseg

    # warmup / compile
    for _ in range(5):
        out = infer(variables, image, radar, pc)
    jax.block_until_ready(out)

    n = 100
    t0 = time.perf_counter()
    for _ in range(n):
        out = infer(variables, image, radar, pc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "EN-GDF-PN-S0 320x320 5-task inference (fwd+decode+NMS, bs=1, bf16)",
        "value": round(fps, 1),
        "unit": "fps/chip",
        "vs_baseline": round(fps / BASELINE_FPS_A4000, 2),
    }))


if __name__ == "__main__":
    main()
