"""Test config: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware; persistent compilation cache keeps reruns fast."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/achelous_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
