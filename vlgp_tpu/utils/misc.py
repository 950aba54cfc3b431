"""Misc utilities: smoothing, binning, rotations, timescale transform.

Reference: ``vlgp/util.py`` (varimax/orthomax/promax ports at 56-85 and
211-318; smoothing at 385-392; spike binning at 515-538; timescale
transform at 429-443).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "smooth",
    "smooth_1d",
    "count",
    "transform_timescale",
    "varimax",
    "orthomax",
    "promax",
    "rotate",
]


def smooth_1d(x, sigma: float = 10.0, radius_mult: float = 4.0):
    """Gaussian smoothing of a 1-D signal (util.py:385-388), zero-padded
    boundaries (scipy ``mode='constant'``)."""
    x = jnp.asarray(x)
    radius = int(radius_mult * sigma + 0.5)
    t = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    kern = jnp.exp(-0.5 * (t / sigma) ** 2)
    kern = kern / jnp.sum(kern)
    return jnp.convolve(x, kern, mode="same")


def smooth(x, sigma: float = 10.0):
    """Column-wise Gaussian smoothing (util.py:391-392)."""
    x = jnp.asarray(x)
    return jax.vmap(lambda c: smooth_1d(c, sigma), in_axes=1, out_axes=1)(x)


def count(t, binwidth, start=None, stop=None):
    """Bin spike times into counts (util.py:515-538)."""
    t = np.asarray(t)
    if t.size == 0:
        return np.array([np.nan])
    start = np.min(t) if start is None else start
    stop = np.max(t) if stop is None else stop
    nbin = int(np.ceil((stop - start) / binwidth)) if stop > start else 1
    bins = start + np.arange(nbin + 1) * binwidth
    return np.histogram(t, bins=bins)[0]


def transform_timescale(timescale, dt):
    """timescale -> omega = 0.5 * (dt / timescale)^2 (util.py:429-443)."""
    return 0.5 * (dt / jnp.asarray(timescale)) ** 2


def varimax(x, normalize: bool = True, tol: float = 1e-5, niter: int = 1000):
    """Varimax loading rotation (util.py:259-318, R port)."""
    x = jnp.asarray(x)
    p, nc = x.shape
    if nc < 2:
        return x, jnp.eye(nc)
    sc = None
    if normalize:
        sc = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        x = x / sc
    TT = jnp.eye(nc, dtype=x.dtype)
    d = 0.0
    for _ in range(niter):
        z = x @ TT
        B = x.T @ (z**3 - z @ jnp.diag(jnp.sum(z**2, axis=0)) / p)
        u, s, vh = jnp.linalg.svd(B, full_matrices=False)
        TT = u @ vh
        dpast = d
        d = float(jnp.sum(s))
        if d < dpast * (1 + tol):
            break
    z = x @ TT
    if normalize:
        z = z * sc
    return z, TT


def orthomax(A, gamma: float = 1.0, normalize: bool = True, rtol: float = 1e-8,
             maxit: int = 250, key=None):
    """Orthomax rotation family (util.py:211-256).

    Degenerate starts restart from a seeded random orthogonal rotation
    (util.py:228-233): when the first SVD step lands on the identity the
    fixed-point gradient is zero and the iteration would stall at the
    (possibly non-optimal) unrotated solution.  ``key`` seeds the restart
    (the reference draws from global NumPy state).
    """
    A = jnp.asarray(A)
    n, m = A.shape
    h = None
    if normalize:
        h = jnp.sqrt(jnp.sum(A**2, axis=1, keepdims=True))
        A = A / h
    T = jnp.eye(m, dtype=A.dtype)
    B = A @ T
    s = 0.0
    for it in range(maxit):
        s_old = s
        L, sv, M = jnp.linalg.svd(
            A.T @ (n * B**3 - gamma * B @ jnp.diag(jnp.sum(B**2, axis=0))),
            full_matrices=False,
        )
        T_new = L @ M
        if it == 0 and float(jnp.linalg.norm(T_new - T)) < rtol:
            # degenerate start (util.py:228-233): the first step landed on
            # the identity, a zero-gradient point — restart from a seeded
            # random orthogonal rotation (reuses this iteration's SVD, so
            # the common non-degenerate case pays nothing extra)
            T, _ = jnp.linalg.qr(
                jax.random.normal(ensure_key(0 if key is None else key),
                                  (m, m), dtype=A.dtype)
            )
            B = A @ T
            continue
        T = T_new
        s = float(jnp.sum(sv))
        B = A @ T
        if (s - s_old) < rtol * s:
            break
    if normalize:
        B = B * h
    return B, T


def promax(x, m: int = 4):
    """Promax oblique rotation (util.py:56-85, R port).

    The reference port drops the power in ``x * abs(x)^(m-1)`` (it
    computes ``x * abs(x) * (m-1)``, util.py:81) — fixed here to the R
    semantics it cites.
    """
    x = jnp.asarray(x)
    if x.shape[1] < 2:
        return x, jnp.eye(x.shape[1])
    xT, TT = varimax(x)
    Q = xT * jnp.abs(xT) ** (m - 1)
    U, *_ = jnp.linalg.lstsq(xT, Q, rcond=None)
    d = jnp.diag(jnp.linalg.inv(U.T @ U))
    U = U @ jnp.diag(jnp.sqrt(d))
    z = xT @ U
    return z, TT @ U


def rotate(x, y):
    """Least-squares alignment of x onto y (util.py:108-118)."""
    beta, *_ = jnp.linalg.lstsq(jnp.asarray(x), jnp.asarray(y), rcond=None)
    return x @ beta


def trial_slices(trial_lengths):
    """Slices of each trial inside a concatenated array (util.py:321-331)."""
    import numpy as _np

    ends = _np.cumsum([0] + list(trial_lengths))
    return [slice(int(ends[i]), int(ends[i + 1])) for i in range(len(trial_lengths))]


def log_calls(f):
    """Decorator logging each call (util.py:420-426)."""
    import functools as _functools
    import logging as _logging

    logger = _logging.getLogger("vlgp_tpu")

    @_functools.wraps(f)
    def wrapper(*args, **kwargs):
        logger.info("%s is called", f.__name__)
        return f(*args, **kwargs)

    return wrapper


def ensure_key(seed_or_key):
    """Turn an int seed / PRNG key into a PRNG key (the JAX-native analog of
    check_random_state, util.py:502-512)."""
    import jax as _jax

    if isinstance(seed_or_key, int):
        return _jax.random.PRNGKey(seed_or_key)
    return seed_or_key
