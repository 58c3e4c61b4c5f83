"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise multi-chip paths without TPU hardware."""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
