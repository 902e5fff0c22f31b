"""Test config: run everything on 8 virtual CPU devices.

This is the JAX-native substitute for multi-node testing (SURVEY.md §4): real
sharding over a Mesh of 8 host devices, deterministic float32 numerics, no TPU
required. Note: in this environment the axon TPU plugin's register() (run from
sitecustomize at interpreter start) force-sets jax_platforms="axon,cpu",
overriding the JAX_PLATFORMS env var — so pin the config HERE, after
sitecustomize but before any backend initializes. Without this, the first
jax.devices() call tries to dial the TPU tunnel and the whole suite hangs in
jaxlib's connect-retry loop whenever the tunnel is down.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

try:
    _cpu0 = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", _cpu0)
except RuntimeError:
    pass


def cpu_devices():
    return jax.devices("cpu")
