"""Fused E-step sweep kernel (ops/sweep.py) vs the unfused E-step.

Interpret-mode runs on CPU: the kernel's sweep chain (predictor, working
residual, Woodbury delta, weight refresh, in-kernel packed Newton-Schulz,
VB marginal variance) must reproduce models/vlgp.py:estep's f32 trajectory
at fixed trip counts.  The unfused CPU path uses exact Cholesky inverses
while the kernel uses residual-checked NS, so the comparison tolerance is
the NS convergence floor, not machine eps.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlgp_tpu.config import default_config, make_params
from vlgp_tpu.data import pack_trials
from vlgp_tpu.models.gp import make_cholesky
from vlgp_tpu.models.vlgp import _xb, _zmajor, estep, update_w
from vlgp_tpu.ops import sweep as sw


def _problem(S=10, T=16, Y=6, Z=2, R=16, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(Z, Y)).astype(np.float32) * 0.4
    trials = []
    for _ in range(S):
        z = np.column_stack(
            [np.sin(np.linspace(0, 4 + i, T)) for i in range(Z)]
        )
        y = rng.poisson(np.exp(z @ a - 1.0)).astype(np.float32)
        trials.append({"y": y, "mu": rng.normal(size=(T, Z)).astype(np.float32) * 0.1})
    config = default_config(dtype="float32", Eniter=3, estep_tol=0.0)
    params = make_params(Y, Z, 1, "poisson", a=a,
                         b=np.full((1, Y), -1.0, np.float32),
                         omega=np.full(Z, 5e-2), rank=R)
    data = pack_trials(trials, Z, 1)
    G = make_cholesky(T, params, rank=R)
    data = update_w(data, params, config)
    return data, params, G, config


def _run_fused(data, params, G, config, xinv=None, vb=True, niter=3,
               tol=0.0):
    xb = _xb(data.x, params.b)
    return sw._sweep_pallas(
        data.y, xb, data.mask, params.a, params.noise, params.poisson,
        G, _zmajor(data.mu), _zmajor(data.w), _zmajor(data.v), xinv,
        niter=niter, tol=tol, dmu_bound=config.dmu_bound,
        ns_iters=config.ns_iters, ns_warm_iters=config.ns_warm_iters,
        vb=vb, interpret=True,
    )


def test_fused_sweep_matches_unfused_estep():
    data, params, G, config = _problem()
    ref = estep(data, params, G, config)
    mu, w, v, dmu, X, resid = _run_fused(data, params, G, config)
    assert float(resid) < 1e-2
    # the NS-vs-exact-Cholesky floor is absolute in the POSTERIOR scale, so
    # dmu (itself a small difference of posteriors) is scored on mu's scale
    mu_scale = np.abs(np.asarray(ref.mu)).max()
    for got, want, scale in (
        (mu, ref.mu, mu_scale),
        (w, ref.w, np.abs(np.asarray(ref.w)).max()),
        (v, ref.v, np.abs(np.asarray(ref.v)).max()),
        (dmu, ref.dmu, mu_scale),
    ):
        want_z = np.asarray(_zmajor(want))
        assert np.abs(np.asarray(got) - want_z).max() / scale < 2e-4


def test_fused_sweep_carried_inverse_and_x_out():
    """The returned X must be (I + G'WG)^{-1} at the RETURNED weights, and
    feeding it back as the carry must reproduce the same trajectory."""
    data, params, G, config = _problem()
    mu, w, v, dmu, X, resid = _run_fused(data, params, G, config)
    Z, S, T = np.asarray(w).shape
    Gn = np.asarray(G)
    Xn = np.asarray(X)
    wn = np.asarray(w)
    R = Gn.shape[-1]
    for z in range(Z):
        for s in range(0, S, 3):
            A = Gn[z].T @ np.diag(wn[z, s]) @ Gn[z]
            err = np.abs((np.eye(R) + A) @ Xn[z, s] - np.eye(R)).max()
            assert err < 1e-2, (z, s, err)
    # warm restart from the carry: identical math, probe-accepted carry
    mu2, *_ = _run_fused(data, params, G, config, xinv=X)
    assert np.isfinite(np.asarray(mu2)).all()


def test_fused_sweep_zeros_warm_start_recovers():
    """The driver's first EM iteration carries xinv = 0 — a Newton-Schulz
    FIXED POINT, which warm refinement can never escape.  The in-kernel
    cold-restart net must recover instead of reporting failure (the round-3
    scaffold tripped the whole-E-step fallback on every first iteration
    because of this)."""
    data, params, G, config = _problem()
    Z, R = G.shape[0], G.shape[-1]
    S = data.y.shape[0]
    X0 = jnp.zeros((Z, S, R, R), jnp.float32)
    ref = estep(data, params, G, config)
    mu, w, v, dmu, X, resid = _run_fused(data, params, G, config, xinv=X0)
    assert float(resid) < 1e-2
    want = np.asarray(_zmajor(ref.mu))
    scale = np.abs(want).max()
    assert np.abs(np.asarray(mu) - want).max() / scale < 2e-4


def test_fused_sweep_dead_lanes_stable():
    """R = 50 packs gpt = 2 matrices per 128-lane tile, leaving lanes
    100:128 DEAD (M is zero there).  A cold start that writes the scaled
    identity across the full diagonal makes NS double the dead entries
    every round — ~144 doublings at niter=16 overflows f32 and the 0*inf
    NaN contaminates the whole iterate.  The masked cold start must keep
    the run finite and converged."""
    data, params, G, config = _problem(T=64, R=50)
    ref = estep(data, params, G, config, niter=16)
    mu, w, v, dmu, X, resid = _run_fused(data, params, G, config, niter=16)
    assert np.isfinite(np.asarray(resid)), "dead-lane NaN leaked"
    assert float(resid) < 1e-2
    want = np.asarray(_zmajor(ref.mu))
    scale = np.abs(want).max()
    assert np.abs(np.asarray(mu) - want).max() / scale < 2e-4


def test_fused_sweep_map_mode_keeps_v():
    data, params, G, config = _problem()
    v0 = _zmajor(data.v)
    mu, w, v, dmu, X, resid = _run_fused(data, params, G, config, vb=False)
    assert np.abs(np.asarray(v) - np.asarray(v0)).max() == 0


def test_fused_sweep_ragged_padding_inert():
    """Zero-masked bins (ragged trials) contribute nothing: mu/w/v stay 0
    there, matching the unfused path."""
    data, params, G, config = _problem()
    mask = np.asarray(data.mask)
    mask[-2:, 10:] = 0.0
    data = data.replace(
        mask=jnp.asarray(mask),
        y=data.y * mask[..., None],
        x=data.x * mask[..., None, None],
        # zero the initial posterior at dead bins: updates are masked in
        # both paths, so whatever sits there initially stays — make it 0
        mu=data.mu * mask[..., None],
        w=data.w * mask[..., None],
        v=data.v * mask[..., None],
    )
    data = update_w(data, params, config)
    ref = estep(data, params, G, config)
    mu, w, v, dmu, X, resid = _run_fused(data, params, G, config)
    dead = mask == 0.0
    assert np.abs(np.asarray(mu)[:, dead]).max() == 0
    assert np.abs(np.asarray(w)[:, dead]).max() == 0
    want = np.asarray(_zmajor(ref.mu))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(mu) - want).max() / scale < 2e-4


def test_fused_sweep_adaptive_exit_converges():
    """Per-block adaptive exit: with a tight trip budget the fixed-count
    and adaptive runs agree once both have converged."""
    data, params, G, config = _problem()
    mu_fix, *_ = _run_fused(data, params, G, config, niter=12, tol=0.0)
    mu_ad, _, _, dmu_ad, _, resid = _run_fused(
        data, params, G, config, niter=12, tol=1e-4
    )
    scale = np.abs(np.asarray(mu_fix)).max()
    assert np.abs(np.asarray(mu_ad) - np.asarray(mu_fix)).max() / scale < 1e-3


def test_eligibility_gate():
    data, params, G, config = _problem()
    from vlgp_tpu.models.vlgp import Dist

    assert sw.sweep_fused_eligible(data, params, G, Dist())
    assert not sw.sweep_fused_eligible(data, params, G,
                                       Dist(model="model"))
    G64 = G.astype(jnp.float64)
    assert not sw.sweep_fused_eligible(
        data.replace(y=data.y.astype(jnp.float64)), params, G64, Dist()
    )
