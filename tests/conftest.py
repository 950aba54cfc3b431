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

# Free compiled executables between test modules.  The full suite compiles
# several hundred XLA:CPU executables in one process; past ~150 live
# executables the CPU client segfaults inside backend_compile (observed
# deterministically at tests/test_regression_pin.py when run after the
# full alphabetical prefix, while every subset passes).  Per-module
# clearing keeps the live set bounded; recompile-count assertions all
# hold within a single module, so they are unaffected.
_last_module = [None]


def pytest_runtest_setup(item):
    mod = item.module.__name__
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
