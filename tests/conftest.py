"""Test config: force CPU with 8 virtual devices so math/sharding tests run
deterministically anywhere (the TPU chip is reserved for bench runs).

Note: the environment's sitecustomize imports jax at interpreter start, so we
must override via jax.config (env vars alone are read too early).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate" not in flags:
    # 8 virtual devices on one core: default 20s/40s rendezvous timeouts
    # abort ('Fatal Python error: Aborted') when the host is loaded
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
