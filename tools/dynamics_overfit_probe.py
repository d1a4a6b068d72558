"""Long-horizon overfit probe: JAX trainer vs the reference torch trainer.

Runs BOTH trainers with the full production stack (focal+dice, weight decay,
cosine schedule, EMA — the config the CLI runs; reference utils/utils_fit.py:
120-174 + train.py:499-523) for `--epochs` shuffled epochs on the 8-sample
learnable fixture, then EMA-evaluates both through the SAME decode/NMS/mAP
path.  This is the slow companion to
tests/test_training_dynamics.py::test_production_stack_trajectory_parity:
step-for-step parity is only assertable over the early transient (SimOTA's
discrete assignments make long horizons chaotic), so the overfit-level
comparison is recorded here as a numbers table (see ARCHITECTURE.md).

Usage: python tools/dynamics_overfit_probe.py [--epochs 120]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")   # torch runs CPU; keep it apples
                                            # to apples (and off the tunnel)
import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    args = ap.parse_args(argv)

    import test_training_dynamics as T
    T.P_EPOCHS = args.epochs

    fixture = T._learnable_fixture(np.random.RandomState(7))
    perms = T._perms(11)
    sd0, sd_ema, torch_traj = T._torch_production(fixture, perms)
    cfg, jm, state, jax_traj = T._jax_production(sd0, fixture, perms)

    from achelous_tpu.utils.torch_import import achelous_mapping, transplant
    ema_vars = transplant(
        jax.tree_util.tree_map(np.asarray,
                               {"params": state.params,
                                "batch_stats": state.batch_stats}),
        sd_ema, achelous_mapping("S0", "en", "gdf"))
    map_torch = T._ema_eval_map50(cfg, jm, ema_vars["params"],
                                  ema_vars["batch_stats"], fixture)
    map_jax = T._ema_eval_map50(cfg, jm, state.ema_params,
                                state.ema_batch_stats, fixture)
    out = {
        "epochs": args.epochs,
        "steps": len(torch_traj),
        "final_losses_torch": [round(float(v), 4) for v in torch_traj[-1]],
        "final_losses_jax": [round(float(v), 4) for v in jax_traj[-1]],
        "mean_last10_torch": [round(float(v), 4)
                              for v in torch_traj[-10:].mean(0)],
        "mean_last10_jax": [round(float(v), 4)
                            for v in jax_traj[-10:].mean(0)],
        "ema_map50_torch": round(float(map_torch), 4),
        "ema_map50_jax": round(float(map_jax), 4),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
