"""Guards the driver contract: __graft_entry__.dryrun_multichip must build its
own n-device CPU mesh and run one sharded train step, whatever platform the
calling process latched (VERDICT round 1, item 1)."""
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402

# full multichip train-step compile (minutes on cold XLA:CPU): slow tier;
# the driver exercises dryrun_multichip independently every round
pytestmark = pytest.mark.slow


def test_cpu_mesh_detection():
    # conftest forces cpu + 8 virtual devices, so up to 8 runs inline.
    assert graft._cpu_mesh_available(8)
    assert not graft._cpu_mesh_available(64)


def test_dryrun_multichip_inline():
    # Runs inline on the pytest CPU platform (fast path, no subprocess).
    graft.dryrun_multichip(len(jax.devices()))


def test_dryrun_multichip_subprocess():
    # Ask for more devices than this process has -> exercises the clean
    # re-exec path the driver depends on when latched to the axon platform.
    graft.dryrun_multichip(len(jax.devices()) + 2)
