"""GPFA: linear-Gaussian latent model, used as warm start and CV engine.

Reference: ``vlgp/gpfa.py``.  The reference materializes Kronecker-product
matrices — ``bigK = kron(I_z, K)``, ``bigC = kron(C', I_n)`` — and solves an
(n*ydim)-sized observation-space system per EM step (gpfa.py:37-45).  Here
the E-step solves the *latent-space* normal equations instead:

    P = kron(I_z, K^-1) + kron(C R^-1 C', I_n)        (zn x zn)
    z = P^-1 vec(C R^-1 (y - d)')

which is algebraically identical (Woodbury / Gaussian conditioning) but
factors one (z*n)^2 matrix shared by all trials instead of an (y*n)^2 one —
for the default window (50) and a 100-channel population that is a 250^2
solve instead of 5000^2.

Deliberate fixes vs the reference (documented behavior edges, not features):
  * gpfa.py:51 sets R = diag(ssr^2) where ssr is the *sum of squared
    residuals* from lstsq — a quantity that scales with dataset size; here
    R is the per-channel residual variance (the actual MLE).
  * gpfa.py:39 applies kron(I_n, R) to a channel-major vectorization, which
    scrambles per-channel noise when R is non-uniform; the latent-space
    form here uses R per channel correctly.
"""
from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .gp import sekernel

__all__ = [
    "make_prior", "em", "em_step", "infer", "leastsq", "loglik",
    "prepare", "fit", "GPFAResult",
]


def _latent_space_estep(y, C, d, Rdiag, K):
    """Posterior mean of z for a stack of equal-length trials.

    y: (m, n, ydim); C: (z, ydim); d: (ydim,); Rdiag: (ydim,); K: (n, n).
    Returns z: (m, n, z).
    """
    m, n, ydim = y.shape
    zdim = C.shape[0]
    Kinv = jnp.linalg.inv(K)
    CRC = (C / Rdiag[None, :]) @ C.T  # (z, z)
    # P[l*n+t, l'*n+t'] = Kinv[t,t'] delta_ll' + CRC[l,l'] delta_tt'
    Iz = jnp.eye(zdim, dtype=y.dtype)
    In = jnp.eye(n, dtype=y.dtype)
    P = jnp.kron(Iz, Kinv) + jnp.kron(CRC, In)
    resid = y - d[None, None, :]
    rhs = jnp.einsum("zy,mty->mzt", C / Rdiag[None, :], resid).reshape(m, zdim * n)
    zvec = jnp.linalg.solve(P, rhs.T).T  # (m, zn)
    return zvec.reshape(m, zdim, n).transpose(0, 2, 1)


def leastsq(Y, Z):
    """Least squares Y ~= Z @ C + d (gpfa.py:78-83).

    Returns (C, d, resid_var) with per-channel residual variance.
    """
    n = Z.shape[0]
    Z1 = jnp.column_stack([Z, jnp.ones((n, 1), Z.dtype)])
    beta, *_ = jnp.linalg.lstsq(Z1, Y, rcond=None)
    C, d = beta[:-1, :], beta[-1, :]
    r = Y - Z1 @ beta
    return C, d, jnp.mean(r * r, axis=0)


def em_step(y, C, d, Rdiag, K):
    """One GPFA EM iteration (gpfa.py:34-53), jittable."""
    m, n, ydim = y.shape
    zdim = C.shape[0]
    z = _latent_space_estep(y, C, d, Rdiag, K)
    z = z - jnp.mean(z, axis=(0, 1), keepdims=True)  # gpfa.py:45
    Z = z.reshape(-1, zdim)
    Y = y.reshape(-1, ydim)
    C, d, rvar = leastsq(Y, Z)
    Rdiag = rvar
    C = C / jnp.linalg.norm(C)  # gpfa.py:52
    return z, C, d, Rdiag


# ONE module-level jitted step: a fresh `jax.jit(em_step)` per `em()` call
# would carry a fresh executable cache each time, recompiling every
# invocation at the same shapes — the exact hotspot _vem_phases fixed for
# the VEM path (models/driver.py:97-105).  CV sweeps call `em` once per
# candidate factor count per fold, so this matters.
_em_step_jit = jax.jit(em_step)


def em(y, C, d, R, K, max_iter: int):
    """GPFA EM loop (gpfa.py:20-56).

    y: (m, n, ydim); C: (z, ydim); d: (ydim,); R: (ydim, ydim) or (ydim,)
    diagonal; K: (n, n).  Returns (z, C, d, R) with R diagonal as (ydim,).
    """
    y = jnp.asarray(y)
    Rdiag = jnp.diagonal(R) if jnp.ndim(R) == 2 else jnp.asarray(R)
    z = None
    for _ in range(max_iter):
        z, C, d, Rdiag = _em_step_jit(y, C, d, Rdiag, K)
    return z, C, d, Rdiag


def infer(y, C, d, Rdiag, K):
    """Posterior latents for new equal-length trials (gpfa.py:59-75)."""
    return _latent_space_estep(jnp.asarray(y), C, d, Rdiag, K)


def make_prior(n: int, dt: float, var: float, scale: float):
    """Dense SE prior for a trial of length n (gpfa.py:11-17)."""
    t = jnp.arange(n) * dt
    return sekernel(t, var, scale)


@dataclasses.dataclass
class GPFAResult:
    """Standalone GPFA fit output (reference gpfa.py:101-120 returns the
    bare tuple ``(y, z, C, d, R)``; this is the typed equivalent, plus the
    full-length posterior the reference's commented-out ``infer`` call never
    delivers).  Indexable like a reference result dict."""

    data: "TrialSet"  # full trials with mu = full-length GPFA posterior
    z: jnp.ndarray  # (nseg, window, zdim) training-segment posterior
    C: jnp.ndarray  # (zdim, ydim) loading
    d: jnp.ndarray  # (ydim,) offset
    R: jnp.ndarray  # (ydim,) per-channel noise variance
    K: jnp.ndarray  # (window, window) segment prior
    config: "Config"
    runtime: dict
    _trials_in: Optional[Sequence[dict]] = None

    @property
    def trials(self) -> List[dict]:
        from ..data import unpack_trials

        return unpack_trials(self.data, self._trials_in)

    @property
    def params(self) -> dict:
        return {"C": self.C, "d": self.d, "R": self.R}

    def __getitem__(self, key):
        if key == "trials":
            return self.trials
        if key == "params":
            return self.params
        if key == "config":
            return self.config
        raise KeyError(key)


def _prepare_full(trials, n_factors, *, dt, var, scale, **config_kwargs):
    """Shared init + segmentation for the public GPFA surface
    (gpfa.py:123-158): FA initialization, window segmentation, dense SE
    prior on the segment grid."""
    from ..api import _prepare
    from ..config import default_config
    from ..data import cut_trials

    config = default_config(**config_kwargs)
    data, params, fm = _prepare(trials, n_factors, config, dt=dt)
    segments = cut_trials(data, config.window, seed=config.seed)
    K = make_prior(segments.nbin, dt, var, scale)
    C0 = params.a
    # offset in DATA space: the reference seeds d with params['b'] — the
    # *log* mean rate (preprocess.py:37) — as the additive offset of a
    # linear model (gpfa.py:153), mixing link scales; exp(b0) = the mean
    # itself is the consistent linear-model offset (same fix api.fastfit
    # makes).
    d0 = jnp.exp(params.b[0])
    R0 = jnp.ones(data.ydim, dtype=K.dtype)
    return data, segments, config, fm, C0, d0, R0, K


def prepare(trials, n_factors, *, dt, var, scale, **config_kwargs):
    """Public GPFA prepare (reference gpfa.py:123-158).

    Returns ``(y, C, d, R, K)``: stacked training segments, initial
    loading/offset/noise, and the dense SE prior on the segment grid —
    the reference's tuple, with R as the (ydim,) diagonal.
    """
    _, segments, _, _, C0, d0, R0, K = _prepare_full(
        trials, n_factors, dt=dt, var=var, scale=scale, **config_kwargs
    )
    return segments.y, C0, d0, R0, K


def fit(trials, n_factors, *, dt, var, scale, max_iter: int = 20,
        verbose: bool = False, **config_kwargs) -> GPFAResult:
    """Standalone GPFA fit (reference gpfa.py:101-120): init ->
    segmentation -> EM on segments -> full-length posterior inference.

    trials: list of dicts with ``y`` (length, ydim); unequal lengths are
    padded and masked.  ``var``/``scale`` parameterize the SE prior
    (kernel fixed during EM, as in the reference).  Per-iteration EM
    wall-clock lands in ``runtime["em_elapsed"]`` (the reference prints it,
    gpfa.py:54, but discards it).
    """
    data, segments, config, _, C, d, R, K = _prepare_full(
        trials, n_factors, dt=dt, var=var, scale=scale, **config_kwargs
    )

    runtime = {"it": 0, "em_elapsed": []}
    y_seg = jnp.asarray(segments.y)
    z = jnp.zeros((y_seg.shape[0], y_seg.shape[1], n_factors), y_seg.dtype)
    for _ in range(max_iter):
        tic = time.perf_counter()
        z, C, d, R = _em_step_jit(y_seg, C, d, R, K)
        jax.block_until_ready(C)
        runtime["it"] += 1
        runtime["em_elapsed"].append(time.perf_counter() - tic)
        if verbose:
            print(f"Iteration {runtime['it']}, "
                  f"EM {runtime['em_elapsed'][-1]:.2f}s")

    # full-length inference under the fitted (C, d, R) — the step the
    # reference sketches but leaves commented out (gpfa.py:115-117).  One
    # dense prior per distinct trial length (stationary kernel on a regular
    # grid: the length-L prior is the L-prefix of the longest one).
    tic = time.perf_counter()
    lengths = np.asarray(data.lengths)
    K_full = make_prior(data.nbin, dt, var, scale)
    mu = np.zeros(data.mu.shape, dtype=np.asarray(data.mu).dtype)
    for L in np.unique(lengths):
        sel = np.nonzero(lengths == L)[0]
        Lt = int(L)
        z_full = infer(data.y[sel, :Lt, :], C, d, R, K_full[:Lt, :Lt])
        mu[sel, :Lt, :] = np.asarray(z_full)
    data = data.replace(mu=jnp.asarray(mu))
    runtime["infer_elapsed"] = time.perf_counter() - tic

    return GPFAResult(
        data=data, z=z, C=C, d=d, R=R, K=K, config=config, runtime=runtime,
        _trials_in=trials,
    )


def loglik(y, z, C, d, Rdiag, var, scale, dt):
    """Gaussian complete-data objective (gpfa.py:86-98).

    The reference formula elementwise-inverts a diagonal matrix
    (``1/sqrt(R)`` on a 2-D array, gpfa.py:94) which produces infs off the
    diagonal; here the residual term is the correctly-weighted sum
    sum(r^2 / R) plus the latent GP quadratic and log-determinant terms.
    """
    m, n, _ = y.shape
    t = jnp.arange(n) * dt
    K = sekernel(t, var, scale)
    r = y - jnp.einsum("mtz,zy->mty", z, C) - d[None, None, :]
    data_term = jnp.sum(r * r / Rdiag[None, None, :])
    Kinv_z = jnp.linalg.solve(K, z.transpose(0, 2, 1).reshape(-1, n).T)
    quad = jnp.sum(Kinv_z.T * z.transpose(0, 2, 1).reshape(-1, n))
    _, logdet = jnp.linalg.slogdet(K)
    zdim = z.shape[-1]
    return data_term + quad + m * zdim * logdet
