"""Model selection: speckled cross-validation over n_factors.

Reference: ``vlgp/model_selection.py`` — element-wise held-out masks over
the GPFA engine.  The reference leaves ``training_error`` unbound when an
inner fit throws (model_selection.py:43-46); errors propagate here.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .config import Config
from .data import cut_trials, pack_trials
from .init import initialize
from .models import gpfa

__all__ = ["speckled_cv", "gmap_speckled_cv", "elementwise_error", "leave_one_neuron_out"]


def elementwise_error(yhat, y):
    """Squared element-wise prediction error (model_selection.py:25-28)."""
    r = yhat - y
    return r * r


def speckled_cv(y, C, d, R, K, test_ratio: float, max_iter: int, key):
    """Speckled CV on one stacked segment set (model_selection.py:11-22).

    Masks a random fraction of entries, fits GPFA on the unmasked data
    (masked entries imputed as the mean), scores both partitions.
    """
    y = jnp.asarray(y)
    test_mask = jax.random.uniform(key, y.shape) < test_ratio
    y = y - jnp.mean(y)  # center so 0-imputation is the mean (ms.py:13)
    y_training = jnp.where(test_mask, 0.0, y)

    z, C, d, R = gpfa.em(y_training, C, d, R, K, max_iter)
    yhat = jnp.einsum("mtz,zy->mty", z, C) + d[None, None, :]
    err = elementwise_error(yhat, y)

    training_error = jnp.mean(jnp.where(test_mask, 0.0, err)) / jnp.mean(~test_mask)
    test_error = jnp.sum(jnp.where(test_mask, err, 0.0)) / jnp.maximum(
        jnp.sum(test_mask), 1
    )
    return float(training_error), float(test_error)


def gmap_speckled_cv(
    trials: Sequence[dict],
    n_factors_list: Sequence[int],
    test_ratio: float = 0.1,
    *,
    dt: float,
    var: float,
    scale: float,
    max_iter: int,
    seed: int = 0,
    window: int = 50,
) -> Tuple[list, list]:
    """CV sweep over candidate factor counts (model_selection.py:31-50)."""
    training_errors = []
    test_errors = []
    key = jax.random.PRNGKey(seed)
    for n_factors in n_factors_list:
        key, sub, init_key = jax.random.split(key, 3)
        config = Config(window=window)
        data = pack_trials(trials, n_factors)
        _, a0, b0, _, _ = initialize(data, n_factors, init_key)
        segments = cut_trials(data, window, seed=seed)
        K = gpfa.make_prior(segments.nbin, dt, var, scale)
        R0 = jnp.ones(data.ydim, dtype=K.dtype)
        tr, te = speckled_cv(
            segments.y, a0, jnp.exp(b0), R0, K, test_ratio, max_iter, sub
        )
        training_errors.append(tr)
        test_errors.append(te)
    return training_errors, test_errors


def leave_one_neuron_out(
    result,
    neurons: Sequence[int] | None = None,
):
    """Leave-one-neuron-out predictive score for a fitted model.

    For each held-out channel n: infer latents from the *other* channels
    under the fitted parameters, then score channel n's observations under
    the model prediction (Poisson log-likelihood up to the y! constant, or
    Gaussian negative squared error).  This is the co-smoothing metric the
    BASELINE configs call for; the reference has no implementation.

    result: :class:`~vlgp_tpu.api.FitResult`.
    Returns dict {neuron: mean predictive log-likelihood per bin}.
    """
    import jax.numpy as jnp

    from .config import make_params
    from .models.driver import infer
    from .models.gp import make_cholesky
    from .models.vlgp import update_v, update_w

    data, params, config = result.data, result.params, result.config
    ydim = params.ydim
    if neurons is None:
        neurons = range(ydim)

    scores = {}
    for n in neurons:
        keep = jnp.asarray([i for i in range(ydim) if i != n])
        params_n = make_params(
            ydim - 1, params.zdim, params.xdim,
            ["poisson" if bool(params.poisson[i]) else "gaussian"
             for i in range(ydim) if i != n],
            a=params.a[:, keep], b=params.b[:, keep],
            noise=params.noise[keep], sigma=params.sigma, omega=params.omega,
            rank=params.rank, gp_noise=params.gp_noise, dt=params.dt,
            dtype=params.a.dtype,
        )
        d_n = data.replace(
            y=data.y[:, :, keep], x=data.x[:, :, :, keep],
            mu=jnp.zeros_like(data.mu), w=jnp.zeros_like(data.w),
            v=jnp.zeros_like(data.v), dmu=jnp.zeros_like(data.dmu),
        )
        G = make_cholesky(d_n.nbin, params_n)
        d_n = update_w(d_n, params_n, config)
        d_n = update_v(d_n, params_n, G, config)
        d_n = infer(d_n, params_n, G, config)

        # predict the held-out channel from the inferred latents
        eta = (
            jnp.einsum("stz,z->st", d_n.mu, params.a[:, n])
            + jnp.einsum("stx,x->st", data.x[:, :, :, n], params.b[:, n])
        )
        m = data.mask
        nvalid = jnp.maximum(jnp.sum(m), 1.0)
        y_n = data.y[:, :, n]
        if bool(params.poisson[n]):
            ll = jnp.sum((y_n * eta - jnp.exp(eta)) * m) / nvalid
        else:
            quad = 0.5 * jnp.einsum("stz,z->st", d_n.v, params.a[:, n] ** 2)
            resid = (y_n - eta) * m
            ll = -0.5 * jnp.sum(
                (resid**2 / params.noise[n]
                 + jnp.log(2 * jnp.pi * params.noise[n]) * m)
            ) / nvalid - jnp.sum(quad * m) / nvalid / params.noise[n]
        scores[int(n)] = float(ll)
    return scores
