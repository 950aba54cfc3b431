"""L0 kernel tests against dense NumPy oracles (model: reference
tests/test_math.py, plus property tests the reference lacks)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vlgp_tpu.ops.ichol import ichol, ichol_gauss, ichol_gauss_batch
from vlgp_tpu.ops.math import orth, rectify, sqexpcov, subspace, trunc_exp


def dense_se(n, omega, dt=1.0):
    x = np.arange(n) * dt
    return np.exp(-omega * (x[:, None] - x[None, :]) ** 2)


def test_ichol_gauss_full_rank():
    # mirrors reference tests/test_math.py:7-14
    n, omega = 200, 1.0
    K = dense_se(n, omega)
    G = np.asarray(ichol_gauss(n, jnp.float64(omega), n))
    assert np.allclose(K, G @ G.T)


@pytest.mark.parametrize(
    "n,omega,rank,tol",
    [(500, 1e-2, 50, 2e-1), (1000, 5e-4, 50, 1e-3), (100, 5e-3, 30, 1e-6)],
)
def test_ichol_gauss_low_rank(n, omega, rank, tol):
    K = dense_se(n, omega)
    G = np.asarray(ichol_gauss(n, jnp.float64(omega), rank))
    err = np.abs(K - G @ G.T).max()
    assert err < tol, err


def test_ichol_gauss_batch_shapes():
    G = ichol_gauss_batch(80, jnp.array([1e-3, 1e-2, 5e-2]), 40)
    assert G.shape == (3, 80, 40)
    for l, om in enumerate([1e-3, 1e-2, 5e-2]):
        K = dense_se(80, om)
        assert np.abs(K - np.asarray(G[l] @ G[l].T)).max() < 1e-2


def test_ichol_general():
    A = dense_se(64, 0.01) + 1e-6 * np.eye(64)
    G = np.asarray(ichol(jnp.asarray(A)))
    assert np.allclose(A, G @ G.T)


def test_orth_preserves_product():
    # mirrors reference tests/test_math.py:17-24
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 10))
    a = rng.random((10, 40))
    x_orth, a_orth = orth(jnp.asarray(x), jnp.asarray(a))
    assert np.allclose(x @ a, np.asarray(x_orth @ a_orth))
    # rows of a_orth are orthonormal
    assert np.allclose(np.asarray(a_orth @ a_orth.T), np.eye(10), atol=1e-8)


def test_rectify():
    rng = np.random.default_rng(1)
    x = rng.normal(size=1000)
    assert np.array_equal(np.asarray(rectify(jnp.asarray(x))), np.maximum(0, x))


def test_trunc_exp_bounded():
    x = jnp.asarray([-5.0, 0.0, 9.0, 50.0])
    out = np.asarray(trunc_exp(x))
    assert np.allclose(out[:3], np.exp([-5.0, 0.0, 9.0]))
    assert out[3] == np.exp(10.0)


def test_sqexpcov_matches_oracle():
    K = np.asarray(sqexpcov(30, 0.01, var=2.0))
    assert np.allclose(K, 2.0 * dense_se(30, 0.01))


def test_subspace_angles():
    rng = np.random.default_rng(2)
    q = np.linalg.qr(rng.normal(size=(50, 3)))[0]
    assert float(subspace(jnp.asarray(q), jnp.asarray(q))) < 1e-4
    q2 = np.linalg.qr(rng.normal(size=(50, 3)))[0]
    assert float(subspace(jnp.asarray(q), jnp.asarray(q2))) > 10.0


def test_effective_rank_truncation_is_exact():
    from vlgp_tpu.models.gp import effective_rank

    for T, omega in [(50, 5e-2), (50, 5e-4), (100, 5e-2)]:
        r = effective_rank(T, omega)
        G = np.asarray(ichol_gauss(T, jnp.float64(omega), min(T, r)))
        K = dense_se(T, omega)
        assert np.abs(K - G @ G.T).max() < 1e-5, (T, omega, r)
    # saturated probe falls back to full rank
    assert effective_rank(500, 5e-2) == 500


def test_nystrom_finite_guard_falls_back_to_ichol():
    """ADVICE-r2: a NaN landmark Cholesky (jitter below the device floor)
    must degrade to the exact pivoted-ichol factor, not NaN the fit."""
    from vlgp_tpu.ops.ichol import nystrom_gauss_batch

    n, rank = 50, 40
    omega = jnp.asarray([1e-2, 5e-2])
    # a negative jitter makes the landmark kernel indefinite -> NaN chol,
    # simulating the marginal-jitter failure on a worse device/compiler
    G = np.asarray(nystrom_gauss_batch(n, omega, rank, jitter=-1.0))
    assert np.isfinite(G).all()
    for z, om in enumerate(np.asarray(omega)):
        K = dense_se(n, float(om))
        assert np.abs(K - G[z] @ G[z].T).max() < 1e-4, om


def test_nystrom_healthy_path_unchanged():
    from vlgp_tpu.ops.ichol import nystrom_gauss_batch

    n, rank = 50, 40
    omega = jnp.asarray([1e-2])
    G = np.asarray(nystrom_gauss_batch(n, omega, rank))
    K = dense_se(n, 1e-2)
    assert np.abs(K - G[0] @ G[0].T).max() < 1e-3


def test_golden_min_grid_escapes_local_minimum():
    """_golden_min with grid >= 3 is a GLOBAL search: a wide shallow local
    minimum must not capture the shrinks when a deeper narrow basin exists
    elsewhere in the box (exactly the H-step's sharp-basin trap — plain
    golden section assumes unimodality and tracks whichever minimum its
    first probes straddle)."""
    from vlgp_tpu.models.gp import _golden_min

    def f(x):
        # deep narrow minimum at 8, wide shallow one at 2
        return -2.0 * jnp.exp(-(((x - 8.0) / 0.5) ** 2)) - jnp.exp(
            -(((x - 2.0) / 3.0) ** 2)
        )

    lo = jnp.asarray([0.0])
    hi = jnp.asarray([10.0])
    x_plain = float(_golden_min(f, lo, hi, 24)[0])
    x_grid = float(_golden_min(f, lo, hi, 24, grid=13)[0])
    assert abs(x_plain - 2.0) < 0.5, x_plain  # golden alone gets trapped
    assert abs(x_grid - 8.0) < 0.01, x_grid  # the scan pins the true basin


def test_golden_min_grid_tiebreak_prefers_smooth():
    """Near-tied basins (within the relative tolerance) must resolve to the
    SMALLEST x deterministically — a float-noise-scale perturbation of the
    objective must not flip the choice."""
    from vlgp_tpu.models.gp import _golden_min

    def make_f(eps):
        def f(x):
            # two equally deep minima at 2 and 8; eps nudges the deep one
            return (
                -jnp.exp(-(((x - 2.0) / 0.4) ** 2))
                - (1.0 + eps) * jnp.exp(-(((x - 8.0) / 0.4) ** 2))
                - 1.0  # keep |fmin| O(1) so the relative tol is meaningful
            )
        return f

    lo, hi = jnp.asarray([0.0]), jnp.asarray([10.0])
    # +/- noise-scale perturbations of the right basin: choice must not move
    for eps in (-1e-6, 0.0, 1e-6):
        x = float(_golden_min(make_f(eps), lo, hi, 24, grid=21)[0])
        assert abs(x - 2.0) < 0.01, (eps, x)
    # a perturbation ABOVE the tolerance is a real difference: follow it
    x = float(_golden_min(make_f(5e-3), lo, hi, 24, grid=21)[0])
    assert abs(x - 8.0) < 0.01, x


def test_golden_min_grid_nan_candidates_lose():
    """A NaN candidate (e.g. an f32 Cholesky failure at an extreme omega)
    must lose the scan, not poison it: review-r3 found a single NaN made
    `near` all-False and locked the bracket to cell 0."""
    from vlgp_tpu.models.gp import _golden_min

    lo = jnp.asarray([np.log(1e-4)])
    hi = jnp.asarray([np.log(1e-1)])
    xstar = np.log(3e-3)

    def f(x):
        good = (x - xstar) ** 2
        return jnp.where(x < np.log(2e-4), jnp.nan, good)

    x = float(_golden_min(f, lo, hi, 24, grid=13)[0])
    assert abs(x - xstar) < 0.05, (x, xstar)

    # all-NaN column: the bracket must collapse onto the box edge so the
    # H-step's at-bound rejection keeps the previous omega
    x = float(_golden_min(lambda x: jnp.full_like(x, jnp.nan),
                          lo, hi, 24, grid=13)[0])
    assert abs(x - float(lo[0])) < 1e-9, x


def test_golden_min_grid_matches_plain_when_unimodal():
    from vlgp_tpu.models.gp import _golden_min

    def f(x):
        return (x - 3.3) ** 2

    lo = jnp.asarray([0.0, 1.0])
    hi = jnp.asarray([10.0, 9.0])
    x_plain = np.asarray(_golden_min(f, lo, hi, 30))
    x_grid = np.asarray(_golden_min(f, lo, hi, 30, grid=9))
    assert np.abs(x_plain - 3.3).max() < 1e-3
    assert np.abs(x_grid - 3.3).max() < 1e-3
