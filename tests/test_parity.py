"""Numerical parity against the reference implementation (the oracle).

These tests run the untouched reference at /root/reference (via the scipy
shim in refshim.py) and compare every EM phase on identical state.
Skipped automatically if the reference can't be imported.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from refshim import load_reference

from vlgp_tpu.config import default_config, make_params
from vlgp_tpu.data import pack_trials
from vlgp_tpu.models.gp import gp_elbo, make_cholesky, posterior_cov_stack
from vlgp_tpu.models.vlgp import (
    constrain_latent,
    constrain_loading,
    estep,
    mstep,
    update_v,
    update_w,
)

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")


@pytest.fixture()
def problem():
    rng = np.random.default_rng(0)
    T, Y, Z, X, S = 50, 8, 3, 1, 4
    a = rng.normal(size=(Z, Y)) * 0.3
    b = rng.normal(size=(X, Y)) * 0.1 - 1.0
    lik = ["poisson"] * 5 + ["gaussian"] * 3
    noise = np.abs(rng.normal(size=Y)) + 0.5
    trials = []
    for _ in range(S):
        z = np.column_stack(
            [
                np.sin(np.linspace(0, 4 * np.pi, T)),
                np.cos(np.linspace(0, 4 * np.pi, T)),
                np.sin(np.linspace(0, 2 * np.pi, T)),
            ]
        )
        eta = z @ a + np.ones((T, X)) @ b
        pois = np.array([l == "poisson" for l in lik])
        y = np.where(
            pois,
            rng.poisson(np.exp(np.clip(eta, -10, 5))),
            eta + rng.normal(size=(T, Y)) * np.sqrt(noise),
        )
        trials.append(
            {"y": y.astype(float), "mu": rng.normal(size=(T, Z)) * 0.1,
             "x": np.ones((T, X, Y))}
        )

    params = make_params(
        Y, Z, X, lik, a=a, b=b, noise=noise, omega=np.full(Z, 1e-2),
        sigma=np.ones(Z), rank=50, dtype=jnp.float64,
    )
    # estep_tol=0: sweep-count parity with the reference requires the
    # reference-matched fixed sweep count
    config = default_config(dtype="float64", Eniter=5, Mniter=5,
                            estep_tol=0, mstep_tol=0)
    data = pack_trials(trials, Z, X, dtype=np.float64)
    G = make_cholesky(T, params)

    ref_params = {
        "zdim": Z, "ydim": Y, "xdim": X, "rank": 50,
        "a": a.copy(), "b": b.copy(), "noise": noise.copy(),
        "sigma": np.ones(Z), "omega": np.full(Z, 1e-2),
        "gp_noise": 1e-4, "dt": 1,
        "likelihood": np.asarray(lik),
        "cholesky": {T: np.asarray(G)},
        "da": np.zeros_like(a), "db": np.zeros_like(b),
    }
    from vlgp.preprocess import get_config

    ref_config = get_config(Eniter=5, Mniter=5)
    ref_trials = [
        dict(
            y=t["y"].copy(), x=t["x"].copy(), mu=t["mu"].copy(),
            w=np.zeros((T, Z)), v=np.zeros((T, Z)), dmu=np.zeros((T, Z)),
        )
        for t in trials
    ]
    return dict(
        data=data, params=params, config=config, G=G,
        ref_params=ref_params, ref_config=ref_config, ref_trials=ref_trials,
        S=S,
    )


def test_update_w_v_parity(problem):
    from vlgp.core import update_v as ruv, update_w as ruw

    p = problem
    ruw(p["ref_trials"], p["ref_params"], p["ref_config"])
    ruv(p["ref_trials"], p["ref_params"], p["ref_config"])
    data = update_w(p["data"], p["params"], p["config"])
    data = update_v(data, p["params"], p["G"], p["config"])
    for i in range(p["S"]):
        assert np.abs(np.asarray(data.w[i]) - p["ref_trials"][i]["w"]).max() < 1e-10
        assert np.abs(np.asarray(data.v[i]) - p["ref_trials"][i]["v"]).max() < 1e-7


def test_estep_mstep_parity(problem):
    from vlgp.core import infer_single_trial, mstep as rmstep
    from vlgp.core import update_v as ruv, update_w as ruw

    p = problem
    ruw(p["ref_trials"], p["ref_params"], p["ref_config"])
    ruv(p["ref_trials"], p["ref_params"], p["ref_config"])
    for t in p["ref_trials"]:
        infer_single_trial(t, p["ref_params"], p["ref_config"])

    data = update_w(p["data"], p["params"], p["config"])
    data = update_v(data, p["params"], p["G"], p["config"])
    data = estep(data, p["params"], p["G"], p["config"])
    for i in range(p["S"]):
        for k in ("mu", "w", "v", "dmu"):
            err = np.abs(np.asarray(getattr(data, k)[i]) - p["ref_trials"][i][k]).max()
            assert err < 1e-6, (k, err)

    rmstep(p["ref_trials"], p["ref_params"], p["ref_config"])
    params = mstep(data, p["params"], p["config"])
    for k in ("a", "b", "noise"):
        err = np.abs(np.asarray(getattr(params, k)) - p["ref_params"][k]).max()
        assert err < 1e-6, (k, err)


def test_mstep_gradient_mode_parity(problem):
    """use_hessian=False must reproduce the reference's plain-gradient
    update delta = learning_rate * grad (core.py:196-197, 215-216)."""
    from vlgp.core import mstep as rmstep
    from vlgp.core import update_v as ruv, update_w as ruw

    p = problem
    ruw(p["ref_trials"], p["ref_params"], p["ref_config"])
    ruv(p["ref_trials"], p["ref_params"], p["ref_config"])
    data = update_w(p["data"], p["params"], p["config"])
    data = update_v(data, p["params"], p["G"], p["config"])

    rc = dict(p["ref_config"], use_hessian=False, learning_rate=0.01)
    rmstep(p["ref_trials"], p["ref_params"], rc)
    config = p["config"].replace(use_hessian=False, learning_rate=0.01)
    params = mstep(data, p["params"], config)
    for k in ("a", "b", "noise"):
        err = np.abs(np.asarray(getattr(params, k)) - p["ref_params"][k]).max()
        assert err < 1e-8, (k, err)
    # and it must observably differ from the Newton path on the same state
    params_newton = mstep(data, p["params"], p["config"])
    assert np.abs(np.asarray(params.a) - np.asarray(params_newton.a)).max() > 1e-6


def test_constrain_loading_parity(problem):
    from vlgp.core import constrain_loading as rcl

    p = problem
    rcl(p["ref_trials"], p["ref_params"], p["ref_config"])
    data, params = constrain_loading(p["data"], p["params"], p["config"])
    assert np.abs(np.asarray(params.a) - p["ref_params"]["a"]).max() < 1e-10
    for i in range(p["S"]):
        assert (
            np.abs(np.asarray(data.mu[i]) - p["ref_trials"][i]["mu"]).max() < 1e-10
        )


def test_constrain_latent_parity(problem):
    from vlgp.core import constrain_latent as rcl

    p = problem
    rc = dict(p["ref_config"], constrain_latent="both")
    ref_trials = [dict(t, mu=t["mu"].copy()) for t in p["ref_trials"]]
    ref_params = dict(p["ref_params"], a=p["ref_params"]["a"].copy(),
                      b=p["ref_params"]["b"].copy())
    rcl(ref_trials, ref_params, rc)
    config = p["config"].replace(constrain_latent="both")
    data, params = constrain_latent(p["data"], p["params"], config)
    assert np.abs(np.asarray(params.a) - ref_params["a"]).max() < 1e-10
    assert np.abs(np.asarray(params.b) - ref_params["b"]).max() < 1e-10
    for i in range(p["S"]):
        assert np.abs(np.asarray(data.mu[i]) - ref_trials[i]["mu"]).max() < 1e-10


def test_gp_elbo_parity(problem):
    """Our ELBO (fixed posterior covariance) == reference gp.elbo on the
    same inputs (gp.py:12-43 also takes post_cov as given)."""
    from vlgp.gp import construct_posterior_cov, elbo as ref_elbo

    rng = np.random.default_rng(1)
    T, S = 50, 6
    mu = np.stack([np.sin(np.linspace(0, 3 * np.pi, T) + rng.uniform(0, 6)) for _ in range(S)])
    w = np.abs(rng.normal(size=(S, T))) * 2 + 0.5
    t = np.arange(T) * 1.0
    for omega in [1e-3, 5e-3, 2e-2]:
        pvec = np.array([1.0, omega, 1e-4])
        post = construct_posterior_cov(t, w.T, pvec.copy())  # (T, T, S)
        ll_ref, _ = ref_elbo(pvec, np.array([0, 1, 0]), t, mu.T, post)
        Sig = posterior_cov_stack(jnp.asarray(w), T, omega, 1.0, 1e-4, 1.0)
        assert np.abs(np.moveaxis(post, -1, 0) - np.asarray(Sig)).max() < 1e-8
        ll = gp_elbo(jnp.log(omega), jnp.asarray(mu), Sig, T, 1.0, 1e-4, 1.0)
        assert abs(ll_ref - float(ll)) < 1e-5 * max(1.0, abs(ll_ref))
