"""Contracts for the adaptive E/M inner-loop exits (round 3).

The adaptive exits change iteration COUNTS, never update math: with a
tolerance of 0 they are the reference-matched fixed-count loops
(exact-parity tests rely on that), with a huge tolerance they take
exactly the minimum 2 trips, and at the default tolerances the result
must agree with the fixed-count result to the tolerance's own scale —
the skipped iterations are noise recirculation by construction
(measured profiles in STATUS.md).
"""
import numpy as np
import jax.numpy as jnp

from vlgp_tpu.config import default_config, make_params
from vlgp_tpu.data import cut_trials, pack_trials
from vlgp_tpu.models.gp import make_cholesky
from vlgp_tpu.models.vlgp import estep, mstep, update_v, update_w


def _state(seed=9, zdim=2, ydim=12, length=140, ntrial=5):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(zdim, ydim)) * 0.6
    trials = []
    for _ in range(ntrial):
        z = np.column_stack(
            (np.sin(np.linspace(0, 7, length)), np.cos(np.linspace(0, 7, length)))
        )
        trials.append({"y": rng.poisson(np.exp(z @ a - 1.6)).astype(float)})
    config = default_config(dtype="float64", window=40)
    params = make_params(ydim, zdim, 1, "poisson", a=a,
                         b=np.full((1, ydim), -1.6),
                         omega=np.full(zdim, 2e-3), dtype=jnp.float64)
    data = pack_trials(trials, zdim, 1, dtype=np.float64)
    seg = cut_trials(data, config.window, seed=0)
    G = make_cholesky(seg.nbin, params)
    seg = update_w(seg, params, config)
    seg = update_v(seg, params, G, config)
    return seg, params, G, config


def test_estep_adaptive_tol_zero_is_fixed_count():
    seg, params, G, config = _state()
    d_fixed = estep(seg, params, G, config.replace(estep_tol=0))
    d_tiny = estep(seg, params, G, config.replace(estep_tol=1e-15))
    # a tolerance below the noise floor never triggers: identical graphs'
    # results match exactly (both run the full Eniter cap)
    np.testing.assert_array_equal(np.asarray(d_fixed.mu), np.asarray(d_tiny.mu))
    np.testing.assert_array_equal(np.asarray(d_fixed.w), np.asarray(d_tiny.w))


def test_estep_adaptive_huge_tol_takes_minimum_trips():
    seg, params, G, config = _state()
    d_min = estep(seg, params, G, config.replace(estep_tol=1e10))
    d_two = estep(seg, params, G, config.replace(estep_tol=0), niter=2)
    np.testing.assert_array_equal(np.asarray(d_min.mu), np.asarray(d_two.mu))


def test_estep_adaptive_default_matches_fixed_to_tolerance():
    seg, params, G, config = _state()
    d_a = estep(seg, params, G, config)  # default estep_tol
    d_f = estep(seg, params, G, config.replace(estep_tol=0))
    rel = np.abs(np.asarray(d_a.mu) - np.asarray(d_f.mu)).max() / (
        np.abs(np.asarray(d_f.mu)).max() + 1e-30
    )
    # the skipped sweeps move mu by <= ~tol per sweep at the noise floor
    assert rel < 30 * config.estep_tol, rel


def test_mstep_adaptive_contracts():
    seg, params, G, config = _state()
    seg = estep(seg, params, G, config.replace(estep_tol=0))

    p_fixed = mstep(seg, params, config.replace(mstep_tol=0))
    p_tiny = mstep(seg, params, config.replace(mstep_tol=1e-15))
    np.testing.assert_array_equal(np.asarray(p_fixed.a), np.asarray(p_tiny.a))

    p_min = mstep(seg, params, config.replace(mstep_tol=1e10))
    p_two = mstep(seg, params, config.replace(mstep_tol=0, Mniter=2))
    np.testing.assert_array_equal(np.asarray(p_min.a), np.asarray(p_two.a))
    np.testing.assert_array_equal(np.asarray(p_min.b), np.asarray(p_two.b))

    p_def = mstep(seg, params, config)  # default mstep_tol
    rel = np.abs(np.asarray(p_def.a) - np.asarray(p_fixed.a)).max() / (
        np.abs(np.asarray(p_fixed.a)).max() + 1e-30
    )
    assert rel < 30 * config.mstep_tol, rel
