"""Two-process jax.distributed worker for tests/test_multihost.py.

Usage: python tests/_multihost_worker.py <port> <process_id> <num_processes>

Each process exposes 4 virtual CPU devices (8 global), brings up
jax.distributed via vlgp_tpu.parallel.initialize_distributed, and runs
fit_sharded on a seeded toy problem over a global (4, 2) mesh — including
an odd channel count (15) to exercise channel padding across hosts.
Prints a checksum line the test compares across processes and against the
single-process result.
"""
import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vlgp_tpu.parallel.driver import fit_sharded, initialize_distributed  # noqa: E402
from vlgp_tpu.parallel.mesh import make_mesh  # noqa: E402

initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import numpy as np  # noqa: E402


def make_trials(seed=2, ntrial=6, length=130, ydim=15, zdim=2):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(zdim, ydim)) * 0.6
    trials = []
    for _ in range(ntrial):
        z = np.column_stack(
            (np.sin(np.linspace(0, 7, length)), np.cos(np.linspace(0, 7, length)))
        )
        trials.append({"y": rng.poisson(np.exp(z @ a - 1.6)).astype(float)})
    return trials


trials = make_trials()
mesh = make_mesh((4, 2))
res = fit_sharded(trials, 2, mesh=mesh, dtype="float64", max_iter=3, min_iter=1)
a = np.asarray(res.params.a)
mu = np.concatenate([np.asarray(t["mu"]) for t in res.trials])
assert np.isfinite(a).all() and np.isfinite(mu).all()
print(f"CHECKSUM a={a.sum():.12e} absa={np.abs(a).sum():.12e} "
      f"mu={np.abs(mu).sum():.12e} ydim={res.params.ydim}", flush=True)
