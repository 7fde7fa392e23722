"""Test config: force CPU with 8 virtual devices so math/sharding tests run
deterministically anywhere (the TPU chip is reserved for bench runs).

Note: the environment's sitecustomize imports jax at interpreter start, so we
must override via jax.config (env vars alone are read too early).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
