"""GPFA engine tests: dense Kronecker oracle + recovery."""
import numpy as np
import jax.numpy as jnp

from vlgp_tpu.models import gpfa


def _dense_oracle_estep(y, C, d, Rdiag, K):
    """Reference-style observation-space solve (gpfa.py:37-44), with the
    per-channel noise placed correctly (kron(R, I_n) for channel-major
    vectorization)."""
    m, n, ydim = y.shape
    zdim = C.shape[0]
    bigK = np.kron(np.eye(zdim), K)
    bigC = np.kron(C.T, np.eye(n))
    bigR = np.kron(np.diag(Rdiag), np.eye(n))
    A = bigK @ bigC.T
    B = bigC @ A + bigR
    resid = (y - d[None, None, :]).transpose(0, 2, 1).reshape(m, -1, 1)
    z = A[None] @ np.linalg.solve(B[None], resid)
    return z.reshape(m, zdim, n).transpose(0, 2, 1)


def test_latent_space_estep_matches_dense_kron():
    rng = np.random.default_rng(0)
    m, n, ydim, zdim = 3, 20, 6, 2
    C = rng.normal(size=(zdim, ydim))
    d = rng.normal(size=ydim)
    Rdiag = np.abs(rng.normal(size=ydim)) + 0.3
    t = np.arange(n, dtype=float)
    K = np.exp(-0.5 * ((t[:, None] - t) / 5.0) ** 2) + 1e-6 * np.eye(n)
    y = rng.normal(size=(m, n, ydim))

    z_fast = np.asarray(
        gpfa._latent_space_estep(
            jnp.asarray(y), jnp.asarray(C), jnp.asarray(d), jnp.asarray(Rdiag),
            jnp.asarray(K),
        )
    )
    z_dense = _dense_oracle_estep(y, C, d, Rdiag, K)
    assert np.abs(z_fast - z_dense).max() < 1e-8


def test_gpfa_em_recovers_subspace():
    rng = np.random.default_rng(1)
    m, n, ydim, zdim = 20, 50, 15, 2
    t = np.arange(n, dtype=float)
    K = np.exp(-0.5 * ((t[:, None] - t) / 8.0) ** 2) + 1e-6 * np.eye(n)
    L = np.linalg.cholesky(K)
    z_true = np.einsum("tu,muz->mtz", L, rng.normal(size=(m, n, zdim)))
    C_true = rng.normal(size=(zdim, ydim))
    d_true = rng.normal(size=ydim) * 0.3
    y = np.einsum("mtz,zy->mty", z_true, C_true) + d_true + rng.normal(size=(m, n, ydim)) * 0.2

    C0 = rng.normal(size=(zdim, ydim)) * 0.1
    z, C, d, R = gpfa.em(
        jnp.asarray(y), jnp.asarray(C0), jnp.zeros(ydim), jnp.ones(ydim),
        jnp.asarray(K), max_iter=30,
    )
    # subspace recovery via lstsq alignment
    Z = np.asarray(z).reshape(-1, zdim)
    Zt = z_true.reshape(-1, zdim)
    X = np.column_stack([Z, np.ones(len(Z))])
    beta, *_ = np.linalg.lstsq(X, Zt, rcond=None)
    zhat = X @ beta
    r2 = 1 - np.sum((zhat - Zt) ** 2) / np.sum((Zt - Zt.mean(0)) ** 2)
    assert r2 > 0.8, r2
    assert (np.asarray(R) > 0).all()


def test_gpfa_infer_matches_em_estep():
    rng = np.random.default_rng(2)
    m, n, ydim, zdim = 2, 15, 5, 2
    C = rng.normal(size=(zdim, ydim))
    d = rng.normal(size=ydim)
    Rdiag = np.abs(rng.normal(size=ydim)) + 0.2
    t = np.arange(n, dtype=float)
    K = np.exp(-0.5 * ((t[:, None] - t) / 4.0) ** 2) + 1e-6 * np.eye(n)
    y = rng.normal(size=(m, n, ydim))
    z = np.asarray(gpfa.infer(y, jnp.asarray(C), jnp.asarray(d), jnp.asarray(Rdiag), jnp.asarray(K)))
    z2 = _dense_oracle_estep(y, C, d, Rdiag, K)
    assert np.abs(z - z2).max() < 1e-8


def test_loglik_finite():
    rng = np.random.default_rng(3)
    m, n, ydim, zdim = 2, 10, 4, 2
    y = rng.normal(size=(m, n, ydim))
    z = rng.normal(size=(m, n, zdim))
    C = rng.normal(size=(zdim, ydim))
    d = rng.normal(size=ydim)
    R = np.abs(rng.normal(size=ydim)) + 0.5
    ll = gpfa.loglik(jnp.asarray(y), jnp.asarray(z), jnp.asarray(C),
                     jnp.asarray(d), jnp.asarray(R), 1.0, 3.0, 1.0)
    assert np.isfinite(float(ll))


def test_em_estep_matches_reference_kronecker():
    """With uniform noise R = c*I the reference's channel-major Kronecker
    assembly (gpfa.py:30-44) is unambiguous (its kron(I_n, R) ordering slip
    is invisible for scalar matrices), so the latent-space solve must match
    it exactly."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from refshim import load_reference

    if load_reference() is None:
        import pytest
        pytest.skip("reference unavailable")
    import numpy.linalg as la

    rng = np.random.default_rng(4)
    m, n, ydim, zdim = 3, 15, 5, 2
    C = rng.normal(size=(zdim, ydim))
    d = rng.normal(size=ydim)
    c_noise = 0.7
    t = np.arange(n, dtype=float)
    K = np.exp(-0.5 * ((t[:, None] - t) / 4.0) ** 2) + 1e-6 * np.eye(n)
    y = rng.normal(size=(m, n, ydim))

    # reference E-step body (gpfa.py:37-44), with R = c*I
    bigK = np.kron(np.eye(zdim), K)
    bigC = np.kron(C.T, np.eye(n))
    bigR = np.kron(np.eye(n), np.eye(ydim) * c_noise)
    A = bigK @ bigC.T
    B = bigC @ A + bigR
    resid = (y - d[None, None, :]).transpose(0, 2, 1).reshape(m, -1, 1)
    z_ref = (A[None] @ la.solve(B[None], resid)).reshape(m, zdim, n).transpose(0, 2, 1)

    z_ours = np.asarray(
        gpfa._latent_space_estep(
            jnp.asarray(y), jnp.asarray(C), jnp.asarray(d),
            jnp.full(ydim, c_noise), jnp.asarray(K),
        )
    )
    assert np.abs(z_ours - z_ref).max() < 1e-8
