"""Test config: run JAX on CPU with 8 virtual devices (the TPU-analogue of
a fake distributed backend, SURVEY.md §4) and enable x64 so golden tests
against the NumPy oracle match at tight tolerance."""

import os

import re as _re

flags = os.environ.get("XLA_FLAGS", "")
# replace (not just append) any pre-existing device-count flag: a
# leftover =4 from a dryrun experiment would silently break the
# 8-virtual-device suite
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax

# The environment pins jax_platforms to the axon TPU plugin; a config
# update after import is the reliable way to force the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on this
# single-core host (hundreds of distinct jitted shapes), and repeat runs
# should not pay XLA again. Works on the CPU backend with the zeroed
# thresholds below (verified on jax 0.9).
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
