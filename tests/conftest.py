"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise multi-chip paths without TPU hardware.

The environment pins JAX_PLATFORMS to the TPU backend and a sitecustomize on
PYTHONPATH may import jax before this file runs, so overriding the env var
alone is not enough — override jax.config too (safe as long as no backend
has been initialized yet).
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the GSPMD-partitioned step programs (e.g.
# the 8-way sharded window-advection step) take minutes of XLA CPU compile
# on this 1-core host; cache them across pytest runs.
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR",
                            os.path.expanduser("~/.cache/jax_test_cache"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
