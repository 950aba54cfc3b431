"""Synthetic data generators (reference: ``vlgp/simulation.py``).

The reference's per-bin Python loops with spike-history feedback
(simulation.py:47-58, 95-104) become ``lax.scan`` over time; randomness is
explicit via PRNG keys instead of global NumPy seeding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .ops.math import identity, trunc_exp

__all__ = ["spike", "lfp", "lorenz"]


def _as3d(x):
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[None, ...]
    return x


def spike(x, a, b, key, link=trunc_exp):
    """Simulate spike trains with spike-history feedback (simulation.py:11-59).

    rate = link(z @ a + history * b);  y ~ min(Poisson(rate), 1)
    (the reference clips counts to {0, 1}, simulation.py:54).

    x: latents (ntrial, ntime, nlatent) or (ntime, nlatent)
    a: (nlatent, nchannel); b: (1 + lag, nchannel) — row 0 is the bias.
    Returns (y, h, rate) with shapes matching the reference:
    y, rate (ntrial, ntime, nchannel); h (nchannel, ntrial, ntime, 1 + lag).
    """
    x = _as3d(x)
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ntrial, ntime, _ = x.shape
    nchannel = a.shape[1]
    lag = b.shape[0] - 1

    def trial(x_m, k):
        def step(carry, inp):
            h_t, k = carry  # h_t: (nchannel, 1 + lag)
            x_t = inp
            eta = x_t @ a + jnp.einsum("cj,jc->c", h_t, b)
            rate = link(eta)
            k, sub = jax.random.split(k)
            y_t = jnp.minimum(jax.random.poisson(sub, rate), 1).astype(x.dtype)
            # roll history rightward, insert current spikes (simulation.py:56-57)
            if lag > 0:
                hist = h_t[:, 1:]
                hist = jnp.concatenate([y_t[:, None], hist[:, :-1]], axis=1)
                h_next = jnp.concatenate([h_t[:, :1], hist], axis=1)
            else:
                h_next = h_t
            return (h_next, k), (y_t, h_t, rate)

        h0 = jnp.zeros((nchannel, 1 + lag), x.dtype).at[:, 0].set(1.0)
        (_, _), (y, h, rate) = lax.scan(step, (h0, k), x_m)
        return y, h, rate

    keys = jax.random.split(key, ntrial)
    y, h, rate = jax.vmap(trial)(x, keys)
    return y, jnp.transpose(h, (2, 0, 1, 3)), rate


def lfp(x, a, b, K, key, link=identity):
    """Simulate Gaussian (LFP) observations (simulation.py:62-105).

    Returns (y, h, mean) shaped as in :func:`spike`.
    """
    x = _as3d(x)
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    K = jnp.asarray(K)
    ntrial, ntime, _ = x.shape
    nchannel = a.shape[1]
    lag = b.shape[0] - 1
    L = jnp.linalg.cholesky(K)

    def trial(x_m, k):
        def step(carry, inp):
            h_t, k = carry
            x_t = inp
            mean = link(x_t @ a + jnp.einsum("cj,jc->c", h_t, b))
            k, sub = jax.random.split(k)
            y_t = mean + L @ jax.random.normal(sub, (nchannel,), x.dtype)
            if lag > 0:
                hist = h_t[:, 1:]
                hist = jnp.concatenate([y_t[:, None], hist[:, :-1]], axis=1)
                h_next = jnp.concatenate([h_t[:, :1], hist], axis=1)
            else:
                h_next = h_t
            return (h_next, k), (y_t, h_t, mean)

        h0 = jnp.zeros((nchannel, 1 + lag), x.dtype).at[:, 0].set(1.0)
        (_, _), (y, h, mean) = lax.scan(step, (h0, k), x_m)
        return y, h, mean

    keys = jax.random.split(key, ntrial)
    y, h, mean = jax.vmap(trial)(x, keys)
    return y, jnp.transpose(h, (2, 0, 1, 3)), mean


def lorenz(n: int, dt: float = 0.01, s: float = 10.0, r: float = 28.0,
           b: float = 2.667, x0=None, normalized: bool = False):
    """Euler-integrated Lorenz attractor trajectory (simulation.py:108-151)."""
    if x0 is None:
        x0 = (0.0, 1.0, 1.05)
    x0 = jnp.asarray(x0, jnp.result_type(1.0))  # float64 under jax_enable_x64

    def step(state, _):
        x, y, z = state
        dx = s * (y - x)
        dy = r * x - y - x * z
        dz = x * y - b * z
        new = jnp.stack([x + dx * dt, y + dy * dt, z + dz * dt])
        return (new[0], new[1], new[2]), new

    _, xs = lax.scan(step, (x0[0], x0[1], x0[2]), None, length=n - 1)
    xs = jnp.concatenate([x0[None, :], xs], axis=0)
    if normalized:
        xs = (xs - xs.mean(axis=0)) / jnp.linalg.norm(xs, axis=0, ord=jnp.inf)
    return xs
