"""Driver-contract regression: `python __graft_entry__.py` must pass in a
fresh process on whatever backend that process picks by default.

This is the exact scenario that failed in round 1 (MULTICHIP_r01): one real
TPU chip as the default backend, `dryrun_multichip(8)` needing an 8-device
mesh.  The entry must (a) provision virtual CPU devices itself and (b) never
lower the Pallas path on the CPU mesh even when the default backend is TPU
(ops/spd.py platform_dependent dispatch).  On a CPU-only host the same
script exercises the virtual-mesh path.
"""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_graft_entry_script():
    env = dict(os.environ)
    # do NOT force a platform: the point is that the script must cope with
    # whatever the driver environment provides
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        # generous: TPU recompiles through the tunnel take minutes, and
        # the full suite's 8-device CPU tests contend for the host
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "entry ok" in proc.stdout
    assert "dryrun_multichip(8) ok" in proc.stdout


_UNHEALTHY_TPU_SCRIPT = r"""
import jax
from jax._src import xla_bridge as xb

def _boom(*a, **k):
    raise RuntimeError("simulated unhealthy TPU backend (libtpu mismatch)")

# Replace the TPU factory with one that dies on initialization, under both
# plugin names seen in the wild, and mimic the bench host's site hook that
# puts the TPU platform first in jax_platforms.  This reproduces
# MULTICHIP_r02's failure mode: merely *discovering* the default backend
# raises FAILED_PRECONDITION.
xb.register_backend_factory("axon", _boom, priority=500, fail_quietly=False)
xb.register_backend_factory("tpu", _boom, priority=500, fail_quietly=False)
jax.config.update("jax_platforms", "axon,cpu")

import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print("dryrun survived unhealthy tpu")
"""


def test_dryrun_survives_unhealthy_tpu_backend():
    """MULTICHIP_r02 regression: dryrun_multichip must never initialize the
    default TPU backend — it is specified to run on a virtual CPU mesh.  An
    unhealthy TPU factory (raises on init) must not be reachable."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _UNHEALTHY_TPU_SCRIPT],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stderr[-3000:], proc.stdout[-500:])
    assert "dryrun survived unhealthy tpu" in proc.stdout
