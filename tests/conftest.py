"""Test harness: run on CPU with 8 virtual devices and float64.

Multi-device tests use the virtual CPU mesh — the TPU-native analog of a
fake backend (see SURVEY.md §4).  float64 lets us compare against the
reference NumPy implementation at tight tolerances.

Note: jax may already be imported by the environment's site hook, so the
platform must be forced via jax.config, not env vars.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
