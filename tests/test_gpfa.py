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


def test_public_prepare_shapes():
    """prepare returns the reference's (y, C, d, R, K) tuple
    (gpfa.py:123-158) on segment shapes."""
    rng = np.random.default_rng(5)
    trials = [{"y": rng.poisson(1.0, size=(70, 8)).astype(float)}
              for _ in range(3)]
    y, C, d, R, K = gpfa.prepare(trials, 2, dt=1.0, var=1.0, scale=5.0,
                                 window=35)
    assert y.ndim == 3 and y.shape[1] == 35 and y.shape[2] == 8
    assert C.shape == (2, 8) and d.shape == (8,) and R.shape == (8,)
    assert K.shape == (35, 35)


def test_public_fit_recovers_latents_ragged():
    """Standalone GPFA fit (gpfa.py:101-120) end-to-end: linear-Gaussian
    data with SE latents, unequal trial lengths; the full-length posterior
    written back into the trials must recover the latents."""
    rng = np.random.default_rng(6)
    zdim, ydim, scale = 2, 15, 8.0
    lengths = [100, 100, 80, 100, 60]
    C_true = rng.normal(size=(zdim, ydim))
    d_true = rng.normal(size=ydim) * 0.3
    trials, z_all = [], []
    for L in lengths:
        t = np.arange(L, dtype=float)
        K = np.exp(-0.5 * ((t[:, None] - t) / scale) ** 2) + 1e-6 * np.eye(L)
        z = np.linalg.cholesky(K) @ rng.normal(size=(L, zdim))
        y = z @ C_true + d_true + rng.normal(size=(L, ydim)) * 0.2
        trials.append({"y": y})
        z_all.append(z)

    res = gpfa.fit(trials, zdim, dt=1.0, var=1.0, scale=scale, max_iter=30,
                   window=50)
    assert res.runtime["it"] == 30
    assert len(res.runtime["em_elapsed"]) == 30
    mu = np.concatenate([t["mu"] for t in res.trials])
    zt = np.concatenate(z_all)
    assert mu.shape == zt.shape
    X = np.column_stack([mu, np.ones(len(mu))])
    beta, *_ = np.linalg.lstsq(X, zt, rcond=None)
    r2 = 1 - np.sum((X @ beta - zt) ** 2) / np.sum((zt - zt.mean(0)) ** 2)
    assert r2 > 0.8, r2
    # result dict-style indexing (reference result-shape compatibility)
    assert res["params"]["C"].shape == (zdim, ydim)
    assert len(res["trials"]) == len(trials)


def test_public_em_first_iteration_matches_reference():
    """From identical (y, C0, d0, uniform R0, K), one EM iteration of the
    reference engine (gpfa.py:20-56) and ours must agree on z, C, d exactly
    (the E-step's kron ordering slip is invisible at uniform R; the M-step
    lstsq never reads R).  R itself diverges BY DESIGN after the first
    M-step: the reference sets R = diag(ssr^2), the squared *sum* of
    squared residuals (gpfa.py:51), while ours is the per-channel residual
    variance MLE."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from refshim import load_reference

    if load_reference() is None:
        import pytest
        pytest.skip("reference unavailable")
    from vlgp import gpfa as ref_gpfa

    rng = np.random.default_rng(7)
    m, n, ydim, zdim = 4, 25, 6, 2
    t = np.arange(n, dtype=float)
    K = np.exp(-0.5 * ((t[:, None] - t) / 5.0) ** 2) + 1e-6 * np.eye(n)
    y = rng.normal(size=(m, n, ydim))
    C0 = rng.normal(size=(zdim, ydim)) * 0.3
    d0 = rng.normal(size=ydim) * 0.1

    z_ref, C_ref, d_ref, R_ref = ref_gpfa.em(
        y, C0.copy(), d0.copy(), np.eye(ydim), K, max_iter=1
    )
    z_our, C_our, d_our, R_our = gpfa.em(
        jnp.asarray(y), jnp.asarray(C0), jnp.asarray(d0),
        jnp.ones(ydim), jnp.asarray(K), max_iter=1,
    )
    assert np.abs(np.asarray(z_our) - z_ref).max() < 1e-7
    assert np.abs(np.asarray(C_our) - C_ref).max() < 1e-7
    assert np.abs(np.asarray(d_our) - d_ref.reshape(-1)).max() < 1e-7
    # documented deliberate fix: ours is the per-channel residual-variance
    # MLE of the lstsq fit (computed before the C /= |C| normalization)
    Z1 = np.column_stack(
        [np.asarray(z_our).reshape(-1, zdim), np.ones(m * n)]
    )
    beta, *_ = np.linalg.lstsq(Z1, y.reshape(-1, ydim), rcond=None)
    r = y.reshape(-1, ydim) - Z1 @ beta
    assert np.abs(np.asarray(R_our) - (r ** 2).mean(0)).max() < 1e-6


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
