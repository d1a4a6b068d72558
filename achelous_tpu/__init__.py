"""Achelous-TPU: TPU-native vision-radar panoptic perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
GuanRunwei/Achelous (water-surface 5-task perception from monocular camera +
4D mmWave radar), designed TPU-first: NHWC layouts, static shapes, fused
kernels, SPMD sharding over device meshes.
"""
import os as _os

import jax as _jax

# Persistent XLA compile cache: first TPU compiles of the full model take
# minutes (remote compile); warm reruns are seconds.  Opt out by setting
# ACHELOUS_NO_COMPILE_CACHE=1 or pre-configuring jax yourself.
#
# Default-on is scoped to TPU-ish processes only (inspected via env, without
# initializing a backend): cached CPU executables embed machine feature
# flags and can SIGILL when reloaded on a different host, and virtual-device
# CPU runs (xla_force_host_platform_device_count) gain nothing.  CPU users
# who want it (e.g. tests/conftest.py) opt in explicitly.
# jax.config.jax_platforms defaults from the JAX_PLATFORMS env var but also
# reflects an in-script jax.config.update("jax_platforms", "cpu") — the
# documented CPU recipe on this rig, where sitecustomize latches the env var
# and only the config override can select CPU.
_platforms = ((_jax.config.jax_platforms
               or _os.environ.get("JAX_PLATFORMS", "")) or "").lower()
# Only the PRIMARY platform counts: the default here is "axon,cpu" (cpu as
# fallback), which is a TPU process.
_is_cpu = (_platforms.split(",")[0].strip() == "cpu"
           or "xla_force_host_platform_device_count"
           in _os.environ.get("XLA_FLAGS", ""))
if (not _os.environ.get("ACHELOUS_NO_COMPILE_CACHE") and not _is_cpu
        and _jax.config.jax_compilation_cache_dir is None):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        _os.path.expanduser("~/.cache/achelous_jax_cache")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from achelous_tpu.core.config import AchelousConfig, WIDTHS  # noqa: E402

__version__ = "0.1.0"
__all__ = ["AchelousConfig", "WIDTHS"]
