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


def elbo_terms(data, params, G, gp_reg: float = 1e-6):
    """Evidence lower bound of the fitted model, by term.

    Not present in the reference (which only exposes the broken ``loglik``);
    useful as the convergence/benchmark metric.  Returns dict with the
    expected log-likelihood and the GP KL term.
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
    return {"poisson_ll": float(pois_ll), "gaussian_ll": float(gauss_ll)}
