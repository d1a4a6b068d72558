"""Test config: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware; persistent compilation cache keeps reruns fast.

Note: the harness's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon latched from the environment, so the platform must be
overridden via jax.config (env edits are too late), and XLA_FLAGS must be set
before the first backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/achelous_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
