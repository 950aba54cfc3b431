"""Trajectory-pinning regression test.

Pins the fused EM step's convergence-norm/hyperparameter trajectory on a
fixed seeded workload (f64, CPU).  Catches silent numeric drift from future
refactors of the E/M/H kernels — the kind of regression recovery-threshold
tests are too loose to see.
"""
import numpy as np
import jax
import jax.numpy as jnp

from vlgp_tpu.config import default_config, make_params
from vlgp_tpu.data import cut_trials, pack_trials
from vlgp_tpu.models.driver import make_em_step
from vlgp_tpu.models.gp import make_cholesky
from vlgp_tpu.models.vlgp import update_w

# recorded from the round-1 implementation (f64 CPU, seeds below)
PINNED = {
    1: dict(mu=1.1626145339e01, a=3.3992684664e00,
            omega=(8.8900697865e-03, 9.4316254794e-03)),
    2: dict(mu=1.0147923396e03, a=1.2186042399e00,
            omega=(8.1844797911e-03, 9.3179439604e-03)),
    3: dict(mu=1.0871737534e03, a=1.2472786100e00,
            omega=(7.4070387112e-03, 9.1615599980e-03)),
}


def test_em_trajectory_pinned():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(2, 10)) * 0.5
    trials = []
    for _ in range(4):
        z = np.column_stack(
            (np.sin(np.linspace(0, 6, 120)), np.cos(np.linspace(0, 6, 120)))
        )
        trials.append(
            {"y": rng.poisson(np.exp(z @ a - 1.5)).astype(float),
             "mu": rng.normal(size=(120, 2)) * 0.1}
        )
    config = default_config(dtype="float64")
    params = make_params(10, 2, 1, "poisson", a=a, b=np.full((1, 10), -1.5),
                         omega=np.full(2, 1e-2), dtype=jnp.float64)
    data = pack_trials(trials, 2, 1, dtype=np.float64)
    seg = cut_trials(data, config.window, seed=0)
    G = make_cholesky(seg.nbin, params)
    seg = update_w(seg, params, config)
    em = jax.jit(make_em_step(config))

    for it in (1, 2, 3):
        seg, params, G, norms = em(seg, params, G)
        pin = PINNED[it]
        assert np.isclose(float(norms["mu"]), pin["mu"], rtol=1e-5), (it, norms)
        assert np.isclose(float(norms["a"]), pin["a"], rtol=1e-5), (it, norms)
        om = np.asarray(params.omega)
        assert np.allclose(om, pin["omega"], rtol=1e-4), (it, om)
