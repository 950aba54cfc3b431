"""Evaluation: timers and model log-likelihood (reference:
``vlgp/evaluation.py``)."""
from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["timer", "loglik", "poisson_loglik", "elbo_terms"]


@contextmanager
def timer():
    """Wall-clock timer context (evaluation.py:7-11), without the reference's
    read-before-assignment quirk: the elapsed closure is valid both inside
    and after the block."""
    tick = time.perf_counter()
    state = {"tock": None}
    try:
        yield lambda: (state["tock"] or time.perf_counter()) - tick
    finally:
        state["tock"] = time.perf_counter()


def poisson_loglik(y, eta):
    """Poisson log-likelihood sum(y * eta - exp(eta)) up to the y! constant."""
    return jnp.sum(y * eta - jnp.exp(eta))


def loglik(fit) -> float:
    """Poisson log-likelihood of a fit.

    The reference version (evaluation.py:14-19) exponentiates twice —
    ``lograte = exp(eta)`` then ``y*lograte - exp(lograte)`` — a documented
    defect (SURVEY §2); the correct ``sum(y*eta - exp(eta))`` is used here.
    Accepts a :class:`~vlgp_tpu.api.FitResult` or a reference-style dict.
    """
    if hasattr(fit, "data"):
        data, params = fit.data, fit.params
        eta = jnp.einsum("stz,zy->sty", data.mu, params.a) + jnp.einsum(
            "stxy,xy->sty", data.x, params.b
        )
        ll = jnp.sum((data.y * eta - jnp.exp(eta)) * data.mask[..., None])
        return float(ll)
    trials, params = fit["trials"], fit["params"]
    total = 0.0
    a = np.asarray(params["a"] if isinstance(params, dict) else params.a)
    b = np.asarray(params["b"] if isinstance(params, dict) else params.b)
    for t in trials:
        x = np.asarray(t["x"])
        xb = np.einsum("txy,xy->ty", x, b) if x.ndim == 3 else x @ b
        eta = np.asarray(t["mu"]) @ a + xb
        total += float(np.sum(t["y"] * eta - np.exp(eta)))
    return total


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("nsel",))
def _gp_bucket_term(G_L, mu_sel, X_sel, eps_total, nsel: int):
    """GP prior expectation for one length bucket: trials pooled at their
    true length Lt.  G_L (Z, Lt, R); mu_sel (Z, nsel, Lt); X_sel (Z, R, R)
    summed Woodbury inverses."""
    Lt = G_L.shape[1]
    Mbar = jnp.einsum("znt,znu->ztu", mu_sel, mu_sel)
    C = Mbar + jnp.einsum("ztr,zrq,zuq->ztu", G_L, X_sel, G_L)
    K = jnp.einsum("ztr,zur->ztu", G_L, G_L) + eps_total * jnp.eye(
        Lt, dtype=G_L.dtype
    )
    Lc = jnp.linalg.cholesky(K)
    half = jax.scipy.linalg.solve_triangular(Lc, C, lower=True)
    Kinv_C = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(Lc, -1, -2), half, lower=False
    )
    logdet = jnp.sum(jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)), axis=-1)
    term = jnp.sum(
        -0.5 * jnp.trace(Kinv_C, axis1=-2, axis2=-1) - nsel * logdet
    )
    # also hand back the prior half-logdets: the posterior entropy needs
    # +nsel * logdet(cholK) per latent (logdet S = logdet K + logdet X)
    return term, nsel * jnp.sum(logdet)


def elbo_terms(data, params, G, gp_reg: float = 1e-6):
    """Evidence lower bound of the fitted model, by term.

    Not present in the reference (which only exposes the broken ``loglik``);
    useful as the convergence/benchmark metric.  Returns dict with the
    expected log-likelihoods, the GP prior expectation term

        gp_prior_ll = sum_l sum_i ( -1/2 mu_i' K_l^-1 mu_i
                                    -1/2 tr(K_l^-1 S_i) - log|chol(K_l)| )

    (the same quantity the H-step optimizes, gp.py:12-43 in the reference;
    posterior covariances are rebuilt from the stored weights via the
    low-rank Woodbury identity S = G (I + G'WG)^{-1} G'), the posterior
    ``entropy`` term (1/2 logdet of each (latent, trial) posterior in the
    prior's column basis — logdet X with X = (I + G'WG)^{-1}, already in
    hand from the Woodbury build, so it is free; without it the series
    tracked by ``config.track_elbo`` would not be monotone under EM), and
    their sum as ``elbo`` — the true ELBO up to constants independent of
    both q and the parameters (the log y! terms and r/2 per latent-trial).
    Exact for ragged trials too:
    trials are pooled per length bucket, each bucket scored against the
    prior restricted to its true length (K is stationary on a regular
    grid, so the padded factor's L-prefix is the length-L factor), so the
    logdet counts each trial's own grid — safe to use as a convergence
    criterion on unequal-length data (VERDICT-r2 weak #6).
    """
    mask = data.mask[..., None]
    eta = jnp.einsum("stz,zy->sty", data.mu, params.a) + jnp.einsum(
        "stxy,xy->sty", data.x, params.b
    )
    quad = 0.5 * jnp.einsum("stz,zy->sty", data.v, params.a**2)
    rate = jnp.exp(eta + quad)
    pois_ll = jnp.sum(
        jnp.where(params.poisson, data.y * eta - rate, 0.0) * mask
    )
    resid = jnp.where(~params.poisson, data.y - eta, 0.0) * mask
    gauss_ll = -0.5 * jnp.sum(
        jnp.where(
            ~params.poisson,
            resid**2 / params.noise + jnp.log(2 * jnp.pi * params.noise) * mask,
            0.0,
        )
    )

    # GP prior expectation term from the pooled second moment (trace
    # linearity; see models/gp.py:gp_elbo_stats)
    from .models.vlgp import _woodbury_inverse, _zmajor

    muz = _zmajor(data.mu) * data.mask[None]
    wz = _zmajor(data.w) * data.mask[None]
    X = _woodbury_inverse(G, wz)  # (Z, N, R, R)

    # Pool trials per length bucket; for a trial of true length L only the
    # first L rows of mu/w are nonzero, and X = (I+G'WG)^{-1} built on the
    # padded grid equals the one built on G[:, :L] (masked w zeroes the
    # padded rows' contribution) — so restricting everything to the
    # L-prefix is exact, not an approximation.
    # One dispatch per distinct trial length (cost scales with the number
    # of unique lengths, not trials — equal-length data stays a single
    # batched op; heavily ragged data pays one small Cholesky per unique
    # length per call).  _gp_bucket_term is module-jitted so repeated
    # calls at the same shapes (e.g. a per-iteration convergence check)
    # reuse the compiled executables.
    lengths = np.asarray(data.lengths)
    gp_ll = 0.0
    prior_half_logdet = 0.0
    for L_true in np.unique(lengths):
        sel = np.nonzero(lengths == L_true)[0]
        Lt = int(L_true)
        term, half_logdet = _gp_bucket_term(
            G[:, :Lt, :], muz[:, sel, :Lt], jnp.sum(X[:, sel], axis=1),
            jnp.asarray(params.gp_noise + gp_reg, G.dtype), len(sel),
        )
        gp_ll += term
        prior_half_logdet += half_logdet
    # posterior entropy: S = G X G' = (K^-1 + W)^-1 exactly under the
    # low-rank prior (push-through identity), so logdet S = logdet K +
    # logdet X and H(q) = 1/2 (logdet K + logdet X) up to a parameter-free
    # constant — the prior's logdet K cancels gp_prior_ll's.  Fully-masked
    # padding contributes exactly 0 (w = 0 there makes X = I).
    _, logdetX = jnp.linalg.slogdet(X)
    entropy = 0.5 * jnp.sum(logdetX) + prior_half_logdet

    out = {
        "poisson_ll": float(pois_ll),
        "gaussian_ll": float(gauss_ll),
        "gp_prior_ll": float(gp_ll),
        "entropy": float(entropy),
    }
    out["elbo"] = (out["poisson_ll"] + out["gaussian_ll"]
                   + out["gp_prior_ll"] + out["entropy"])
    return out
