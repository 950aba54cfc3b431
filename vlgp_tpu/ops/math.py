"""Elementary math ops (reference: ``vlgp/math.py``, ``vlgp/util.py``).

Pure jnp one-liners plus the SVD orthogonalization and factor-rotation
utilities.  Everything here is jit/vmap-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


__all__ = [
    "rectify",
    "trunc_exp",
    "log1exp",
    "identity",
    "sqexpcov",
    "orth",
    "subspace",
    "add_diag",
]


def rectify(x):
    """Rectified-linear link (``math.py:14-21``)."""
    return jnp.maximum(x, 0.0)


def trunc_exp(x, bound: float = 10.0):
    """exp with the argument clipped from above (``math.py:24-38``).

    Keeps Poisson rates finite during early, badly-scaled iterations.
    """
    return jnp.exp(jnp.minimum(x, bound))


def log1exp(x):
    """log(1 + exp(x)) (``math.py:61-73``), numerically stable."""
    return jnp.logaddexp(x, 0.0)


def identity(x):
    return x


def sqexpcov(n: int, w, var=1.0, dt: float = 1.0, dtype=jnp.float32):
    """Dense squared-exponential covariance on a regular grid.

    K[i, j] = var * exp(-w * ((i - j) * dt)^2)   (``util.py:40-53``).
    """
    t = jnp.arange(n, dtype=dtype) * dt
    dsq = (t[:, None] - t[None, :]) ** 2
    return var * jnp.exp(-w * dsq)


def orth(x, a):
    """Orthogonalize loading rows; rotate latents to keep x @ a fixed.

    Reference: ``math.py:201-215``.  Returns (x_orth, a_orth) with
    x @ a == x_orth @ a_orth.
    """
    _, _, vh = jnp.linalg.svd(a, full_matrices=False)
    a_orth = vh
    x_orth = x @ a @ vh.T
    return x_orth, a_orth


def subspace(a, b, deg: bool = True):
    """Largest principal angle between the column spaces of a and b.

    Reference: ``math.py:172-198`` (MATLAB ``subspace`` port).  Used as the
    latent-recovery metric in tests.
    """
    qa, _ = jnp.linalg.qr(a)
    qb, _ = jnp.linalg.qr(b)
    if qa.shape[1] < qb.shape[1]:
        qa, qb = qb, qa
    qb = qb - qa @ (qa.T @ qb)
    s = jnp.linalg.norm(qb, ord=2)
    rad = jnp.arcsin(jnp.clip(s, 0.0, 1.0))
    return jnp.degrees(rad) if deg else rad


def add_diag(m, v):
    """Return m with v added to its diagonal (``math.py:218-221``, pure).

    v may be a scalar or a vector matching the trailing dim; broadcasts over
    leading batch dims of m.
    """
    n = m.shape[-1]
    eye = jnp.eye(n, dtype=m.dtype)
    v = jnp.asarray(v, m.dtype)
    if v.ndim == 0:
        return m + v * eye
    return m + eye * v[..., None, :]


def lexp(x, c: float = 0.0):
    """Linearized exp: exp(x) below c, first-order expansion above
    (``math.py:41-43``; vectorized — the reference version is scalar-only)."""
    x = jnp.asarray(x)
    return jnp.where(x < c, jnp.exp(jnp.minimum(x, c)), jnp.exp(c) * (1.0 - c + x))


def clip(a, lbound, ubound=None):
    """Symmetric/box clip (pure; the reference mutates in place,
    util.py:446-454)."""
    if ubound is None:
        ubound = lbound
        lbound = -lbound
    return jnp.clip(a, lbound, ubound)
