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



import jax
import jax.numpy as jnp

from .gp import sekernel

__all__ = ["make_prior", "em", "em_step", "infer", "leastsq", "loglik"]


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
