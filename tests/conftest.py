"""Test config: run everything on 8 virtual CPU devices.

This is the JAX-native substitute for multi-node testing (SURVEY.md §4): real
sharding over a Mesh of 8 host devices, deterministic float32 numerics, no TPU
required. Note: in this environment the axon TPU plugin ignores
JAX_PLATFORMS=cpu, so we additionally pin jax_default_device to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    _cpu0 = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", _cpu0)
except RuntimeError:
    pass


def cpu_devices():
    return jax.devices("cpu")
