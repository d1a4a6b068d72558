"""EMA parity against the reference ModelEMA (loss/detection_loss.py:433-463).

The reference keeps an EMA copy of the state_dict with the ramped decay
d = decay * (1 - exp(-updates / tau)).  This golden runs BOTH trackers over
the same sequence of parameter states and requires identical EMA values,
including the warmup ramp and non-float passthrough.
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

import jax.numpy as jnp  # noqa: E402
from loss.detection_loss import ModelEMA  # noqa: E402

from achelous_tpu.train.ema import ema_update  # noqa: E402


class _Tiny(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.lin = torch.nn.Linear(4, 3)
        self.bn = torch.nn.BatchNorm1d(3)


def test_ema_matches_reference_ramp():
    torch.manual_seed(0)
    model = _Tiny()
    ref = ModelEMA(model, decay=0.9999, tau=2000.0)

    ema_tree = {k: jnp.asarray(v.detach().numpy())
                for k, v in model.state_dict().items()
                if v.dtype.is_floating_point}

    rng = np.random.RandomState(0)
    for step in range(1, 12):
        # mutate the model like an optimizer step would
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.from_numpy(
                    rng.randn(*p.shape).astype(np.float32)) * 0.1)
            model.bn.running_mean.add_(0.05)
        ref.update(model)
        new_tree = {k: jnp.asarray(v.detach().numpy())
                    for k, v in model.state_dict().items()
                    if v.dtype.is_floating_point}
        ema_tree = ema_update(ema_tree, new_tree, jnp.int32(step),
                              decay=0.9999, tau=2000.0)

    ref_sd = ref.ema.state_dict()
    for k, v in ema_tree.items():
        np.testing.assert_allclose(
            np.asarray(v), ref_sd[k].detach().numpy(), rtol=1e-6, atol=1e-7,
            err_msg=f"EMA diverges from reference for {k}")


def test_ema_ramp_starts_near_raw_params():
    """At update 1 the ramp d ~ decay/2000 -> the EMA is ~the new params."""
    ema = {"w": jnp.zeros(3)}
    new = {"w": jnp.ones(3)}
    out = ema_update(ema, new, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0, atol=1e-3)


def test_ema_non_float_leaves_pass_through():
    ema = {"step": jnp.int32(3), "w": jnp.ones(2)}
    new = {"step": jnp.int32(9), "w": jnp.zeros(2)}
    out = ema_update(ema, new, jnp.int32(5000))
    assert int(out["step"]) == 9
