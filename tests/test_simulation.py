"""Simulation module tests."""
import numpy as np
import jax
import jax.numpy as jnp

from vlgp_tpu.simulation import lfp, lorenz, spike


def test_lorenz_shape_and_dynamics():
    xs = np.asarray(lorenz(500))
    assert xs.shape == (500, 3)
    assert np.isfinite(xs).all()
    # matches the reference Euler integrator step-for-step
    def ref_lorenz(n, dt=0.01, s=10, r=28, b=2.667, x0=(0.0, 1.0, 1.05)):
        xs = np.empty((n, 3))
        xs[0] = x0
        for i in range(n - 1):
            x, y, z = xs[i]
            xs[i + 1] = xs[i] + dt * np.array([s * (y - x), r * x - y - x * z, x * y - b * z])
        return xs
    assert np.abs(xs - ref_lorenz(500)).max() < 1e-3


def test_lorenz_normalized():
    xs = np.asarray(lorenz(300, normalized=True))
    assert np.abs(xs.mean(0)).max() < 1e-10
    # reference semantics: centered, divided by the *uncentered* inf-norm
    raw = np.asarray(lorenz(300))
    expected = (raw - raw.mean(0)) / np.abs(raw).max(0)
    assert np.abs(xs - expected).max() < 1e-10


def test_spike_shapes_and_rates():
    rng = np.random.default_rng(0)
    ntrial, ntime, zdim, ydim, lag = 3, 100, 2, 8, 2
    x = rng.normal(size=(ntrial, ntime, zdim)) * 0.5
    a = rng.normal(size=(zdim, ydim)) * 0.3
    b = np.zeros((1 + lag, ydim))
    b[0] = -1.5
    b[1] = -0.5  # refractory-ish history
    y, h, rate = spike(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), jax.random.PRNGKey(0))
    assert y.shape == (ntrial, ntime, ydim)
    assert h.shape == (ydim, ntrial, ntime, 1 + lag)
    assert rate.shape == (ntrial, ntime, ydim)
    y = np.asarray(y)
    assert set(np.unique(y)).issubset({0.0, 1.0})  # clipped to binary
    # history column 1 holds the previous bin's spikes
    assert np.allclose(np.asarray(h)[:, :, 1:, 1].transpose(1, 2, 0), y[:, :-1, :])
    # empirical rate in the ballpark of exp(b0)
    assert 0.3 < y.mean() / np.exp(-1.5) < 3.0


def test_lfp_shapes():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 50, 2))
    a = rng.normal(size=(2, 5))
    b = np.zeros((1, 5))
    K = np.eye(5) * 0.1
    y, h, mu = lfp(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), jnp.asarray(K),
                   jax.random.PRNGKey(1))
    assert y.shape == (2, 50, 5)
    resid = np.asarray(y) - np.asarray(mu)
    assert 0.05 < resid.std() ** 2 < 0.2


def test_spike_2d_latents_promoted():
    x = np.zeros((20, 2))
    a = np.zeros((2, 3))
    b = np.zeros((1, 3))
    y, h, rate = spike(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), jax.random.PRNGKey(2))
    assert y.shape == (1, 20, 3)
