"""Test config: run JAX on CPU with 8 virtual devices (the TPU-analogue of
a fake distributed backend, SURVEY.md §4) and enable x64 so golden tests
against the NumPy oracle match at tight tolerance."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment pins jax_platforms to the axon TPU plugin; a config
# update after import is the reliable way to force the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
