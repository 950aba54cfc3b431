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

# recorded from the round-1 implementation (f64 CPU, seeds below);
# re-pinned round 3 when the H-step grid scan (hyper_grid=13) and
# profiled-sigma learning (hyper_learn_sigma) became the defaults,
# round 4 when hyper_refines=2 (trust-region-clamped Aitken accept,
# re-scored at parity with the 3-refine polish) became the default, and
# round 5 when estep_tol=3e-3 became the default (the E-step trip count
# changes on this workload; quality scored at parity across all four
# draws, see config.py) — the iter-1 mu/a norms are bit-identical to the
# round-1 lineage, later values differ through the E/H-step changes.
PINNED = {
    1: dict(mu=1.1626145339e01, a=3.3992684664e00,
            omega=(9.5229154213e-03, 9.7148844468e-03),
            sigma=(1.0294178887e00, 1.0175820439e00)),
    2: dict(mu=1.0149070116e03, a=1.2227973037e00,
            omega=(9.5140337855e-03, 9.6630545207e-03),
            sigma=(1.0200966589e00, 1.0173759538e00)),
    3: dict(mu=1.1135698543e03, a=1.2238562100e00,
            omega=(9.3780814452e-03, 9.5843112278e-03),
            sigma=(1.0218232261e00, 1.0194071084e00)),
}


def test_em_trajectory_pinned():
    seg, params, G, config = _setup()
    em = jax.jit(make_em_step(config))

    for it in (1, 2, 3):
        seg, params, G, norms = em(seg, params, G)
        pin = PINNED[it]
        assert np.isclose(float(norms["mu"]), pin["mu"], rtol=1e-5), (it, norms)
        assert np.isclose(float(norms["a"]), pin["a"], rtol=1e-5), (it, norms)
        om = np.asarray(params.omega)
        assert np.allclose(om, pin["omega"], rtol=1e-4), (it, om)
        sg = np.asarray(params.sigma)
        assert np.allclose(sg, pin["sigma"], rtol=1e-5), (it, sg)

def _setup():
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
    return seg, params, G, config


# the same workload run THROUGH the shipped hyper_interval cadence (the
# iteration index threaded into the in-graph cond, as every driver does):
# iteration indices 0, 1, 2 at the default hyper_interval=2 run H, skip,
# H.  Pins the branch test_em_trajectory_pinned cannot see — the skipped
# iteration must carry omega/sigma BIT-identically, and the it=2 H-step
# solves against a two-iterations-evolved posterior, landing a different
# omega than the every-iteration trajectory above (review-r5 finding).
PINNED_CADENCE = {
    0: dict(mu=1.1626145339e01, a=3.3992684664e00,
            omega=(9.5229154213e-03, 9.7148844468e-03)),
    1: dict(mu=1.0149070116e03, a=1.2227973037e00),
    2: dict(mu=1.1135698543e03, a=1.2238562100e00,
            omega=(9.5298567848e-03, 9.6384049406e-03),
            sigma=(1.0193777097e00, 1.0194038812e00)),
}


def test_em_trajectory_pinned_at_default_cadence():
    seg, params, G, config = _setup()
    raw = make_em_step(config)
    em = jax.jit(lambda d, p, g, it: raw(d, p, g, it=it))

    assert config.hyper_interval == 2  # the cadence this test pins
    prev_om = prev_sg = None
    for it in (0, 1, 2):
        seg, params, G, norms = em(seg, params, G, it)
        pin = PINNED_CADENCE[it]
        assert np.isclose(float(norms["mu"]), pin["mu"], rtol=1e-5), (it, norms)
        assert np.isclose(float(norms["a"]), pin["a"], rtol=1e-5), (it, norms)
        om = np.asarray(params.omega)
        sg = np.asarray(params.sigma)
        if it == 1:  # skipped H-step: hyperparameters carried bit-exactly
            assert np.array_equal(om, prev_om), (om, prev_om)
            assert np.array_equal(sg, prev_sg), (sg, prev_sg)
        if "omega" in pin:
            assert np.allclose(om, pin["omega"], rtol=1e-4), (it, om)
        if "sigma" in pin:
            assert np.allclose(sg, pin["sigma"], rtol=1e-5), (it, sg)
        prev_om, prev_sg = om, sg
