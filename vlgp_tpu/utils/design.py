"""Design-matrix builders for spike-history / autoregressive regressors.

Reference: ``vlgp/util.py:20-37, 88-157, 333-382``.  Vectorized (rolls and
gathers) instead of per-row Python loops.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

__all__ = ["lagmat", "add_constant", "history", "makeregressor", "auto", "regmat"]


def lagmat(x, lag: int):
    """Autoregression matrix: column j holds x lagged by j+1 (util.py:135-157)."""
    x = jnp.asarray(x)
    if x.ndim < 2:
        x = x[:, None]
    nrow, ncol = x.shape
    if lag >= nrow:
        raise ValueError("lag should be < nrow")
    cols = []
    for k in range(1, lag + 1):
        shifted = jnp.pad(x, ((k, 0), (0, 0)))[:nrow]
        cols.append(shifted)
    return jnp.concatenate(cols, axis=1) if cols else jnp.zeros((nrow, 0))


def add_constant(x):
    """Prepend an all-ones column (util.py:121-132)."""
    x = jnp.asarray(x)
    return jnp.column_stack([jnp.ones((x.shape[0], 1), x.dtype), x])


def history(obs, lag: int):
    """Per-channel autoregressive design (util.py:88-105).

    obs: (ntime, nchannel) -> (nchannel, ntime, 1 + lag).
    """
    obs = jnp.asarray(obs)
    mats = [add_constant(lagmat(obs[:, n], lag)) for n in range(obs.shape[1])]
    return jnp.stack(mats)


def makeregressor(obs, p: int):
    """Full cross-history design (util.py:20-37): (T, 1 + p*N)."""
    obs = np.asarray(obs)
    T, N = obs.shape
    reg = np.ones((T, 1 + p * N), float)
    for t in range(T):
        if t - p >= 0:
            reg[t, 1:] = obs[t - p : t, :].flatten()
        else:
            reg[t, 1 + (p - t) * N :] = obs[:t, :].flatten()
    return jnp.asarray(reg)


def auto(y: List, lag: int):
    """Stacked per-channel autoregressive designs across trials
    (util.py:333-350): (y_ndim, total_time, 1 + lag)."""
    assert len(y) > 0
    per_trial = []
    for trial in y:
        trial = jnp.asarray(trial)
        per_trial.append(history(trial, lag))
    return jnp.concatenate(per_trial, axis=1)


def regmat(y: List, x: Optional[List], lag: int = 0):
    """Autoregressive + external regressors (util.py:363-382)."""
    automat = auto(y, lag)
    big_x = jnp.concatenate([jnp.asarray(t) for t in x], axis=0)
    ydim = automat.shape[0]
    tiled = jnp.broadcast_to(big_x[None], (ydim,) + big_x.shape)
    return jnp.concatenate([automat, tiled], axis=2)
