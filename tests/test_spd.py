"""ops/spd tests: Newton-Schulz inverse (forced on CPU), warm start +
fallback, Pallas kernel in interpreter mode, XLA reference path."""
import numpy as np
import jax.numpy as jnp
import pytest

from vlgp_tpu.ops.spd import inv_one_plus_psd, spd_inverse, spd_solve


def _psd(batch, R, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=batch + (R, R // 2)).astype(np.float32)
    return jnp.asarray(np.einsum("...rk,...qk->...rq", G, G) * scale)


def test_ns_matches_exact():
    A = _psd((6,), 32, 0.3)
    X_ns = np.asarray(inv_one_plus_psd(A, iters=16, force="ns"))
    X_ref = np.linalg.inv(np.asarray(A) + np.eye(32))
    assert np.abs(X_ns - X_ref).max() < 1e-4


def test_ns_handles_large_eigenvalues():
    A = _psd((4,), 24, 50.0)  # lambda_max up to ~1e3
    X_ns = np.asarray(inv_one_plus_psd(A, iters=20, force="ns"))
    M = np.asarray(A) + np.eye(24)
    resid = np.einsum("brk,bkq->brq", M, X_ns) - np.eye(24)
    assert np.abs(resid).max() < 1e-3


def test_ns_warm_start_refines():
    A = _psd((5,), 16, 0.5, seed=1)
    X_exact = jnp.asarray(np.linalg.inv(np.asarray(A) + np.eye(16)))
    # perturb the system slightly; warm start from the old inverse
    A2 = A * 1.02
    X_warm = np.asarray(
        inv_one_plus_psd(A2, iters=16, force="ns", warm=X_exact, warm_iters=4)
    )
    X_ref = np.linalg.inv(np.asarray(A2) + np.eye(16))
    assert np.abs(X_warm - X_ref).max() < 1e-4


def test_ns_warm_fallback_on_garbage():
    """A useless warm start must trigger the cold fallback, not diverge."""
    A = _psd((3,), 16, 0.5, seed=2)
    garbage = jnp.ones_like(A) * 100.0
    X = np.asarray(
        inv_one_plus_psd(A, iters=16, force="ns", warm=garbage, warm_iters=3)
    )
    X_ref = np.linalg.inv(np.asarray(A) + np.eye(16))
    assert np.isfinite(X).all()
    assert np.abs(X - X_ref).max() < 1e-4


def test_ns_cold_escalates_on_huge_eigenvalues():
    """ADVICE-r1 regression: a fixed-count cold NS start on an extreme
    system (lambda_max ~4e4, where 16 iterations leave a ~0.1 error) must
    residual-check and escalate instead of silently returning garbage."""
    A = _psd((3,), 16, 1e3, seed=7)  # lambda_max ~4e4
    X = np.asarray(inv_one_plus_psd(A, iters=16, force="ns"))
    M = np.asarray(A, dtype=np.float64) + np.eye(16)
    X_ref = np.linalg.inv(M)
    assert np.isfinite(X).all()
    # un-escalated 16-iteration NS leaves max error ~0.107 here
    assert np.abs(X - X_ref).max() < 5e-3


def test_auto_dispatch_runs_on_cpu():
    """force=None must pick the platform's path at lowering time
    (lax.platform_dependent) — on CPU that is the exact-Cholesky route."""
    A = _psd((4,), 16, 0.5, seed=8)
    X = np.asarray(inv_one_plus_psd(A))
    X_ref = np.linalg.inv(np.asarray(A) + np.eye(16))
    assert np.abs(X - X_ref).max() < 1e-4
    B = A + jnp.eye(16)
    Xi = np.asarray(spd_inverse(B))
    assert np.abs(Xi - np.linalg.inv(np.asarray(B))).max() < 1e-4


def test_xla_path_exact():
    A = _psd((4,), 20, 1.0, seed=3)
    X = np.asarray(inv_one_plus_psd(A, force="xla"))
    X_ref = np.linalg.inv(np.asarray(A) + np.eye(20))
    assert np.abs(X - X_ref).max() < 1e-4


def test_pallas_interpret_inverse():
    A = _psd((5,), 40, 0.2, seed=4) + 0.5 * jnp.eye(40)
    X = np.asarray(spd_inverse(A, force="interpret"))
    assert np.abs(X - np.linalg.inv(np.asarray(A))).max() < 1e-3


def test_spd_solve():
    A = _psd((3,), 12, 0.5, seed=5) + jnp.eye(12)
    rng = np.random.default_rng(6)
    b = jnp.asarray(rng.normal(size=(3, 12)).astype(np.float32))
    x = np.asarray(spd_solve(A, b))
    ref = np.linalg.solve(np.asarray(A), np.asarray(b)[..., None])[..., 0]
    assert np.abs(x - ref).max() < 1e-4


def test_packed_probe_skip_interpret():
    """Fused probe+refine kernel (r3): converged blocks pass the warm start
    through; drifted blocks refine — per grid block, in one kernel."""
    from vlgp_tpu.ops.spd import _ns_packed_pallas, _packed_geometry

    R = 40
    # must match the tiles the probe_skip path actually uses (spd.py)
    _, _, per_block, _ = _packed_geometry(96, R, tiles=12)
    B = 2 * per_block  # two grid blocks
    A = np.asarray(_psd((B,), R, 0.3, seed=9), np.float32)
    X_exact = np.linalg.inv(A + np.eye(R, dtype=np.float32)).astype(np.float32)

    # block 1 carries the exact inverse (skips), block 2 garbage (refines)
    x0 = X_exact.copy()
    x0[per_block:] = X_exact[per_block:] * 0.5
    X, resid = _ns_packed_pallas(
        jnp.asarray(A), iters=10, x0=jnp.asarray(x0), probe_skip=True,
        interpret=True,
    )
    X = np.asarray(X)
    assert float(resid) < 1e-2
    # converged block passed through unchanged
    np.testing.assert_array_equal(X[:per_block], x0[:per_block])
    # drifted block was refined to the true inverse
    assert np.abs(X[per_block:] - X_exact[per_block:]).max() < 1e-3


def test_packed_probe_skip_all_converged_interpret():
    from vlgp_tpu.ops.spd import _ns_packed_pallas

    R = 16
    A = np.asarray(_psd((6,), R, 0.5, seed=10), np.float32)
    X_exact = np.linalg.inv(A + np.eye(R, dtype=np.float32)).astype(np.float32)
    X, resid = _ns_packed_pallas(
        jnp.asarray(A), iters=8, x0=jnp.asarray(X_exact), probe_skip=True,
        interpret=True,
    )
    assert float(resid) < 1e-2
    np.testing.assert_array_equal(np.asarray(X), X_exact)


# ---------------------------------------------------------------------------
# Fused Gram + NS kernel (round 3): X = (I + G'diag(w)G)^{-1} with the Gram
# built in-kernel and v = diag(G X G') emitted from VMEM.
# ---------------------------------------------------------------------------


def _gram_problem(Z=2, S=5, T=12, R=8, seed=11, scale=1.0):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(Z, T, R)).astype(np.float32) * 0.5
    w = (rng.uniform(size=(Z, S, T)) * scale).astype(np.float32)
    A = np.einsum("ztr,zst,ztq->zsrq", G, w, G)
    X_ref = np.linalg.inv(A + np.eye(R, dtype=np.float32))
    v_ref = np.einsum("ztr,zsrq,ztq->zst", G, X_ref, G)
    return jnp.asarray(G), jnp.asarray(w), X_ref, v_ref


def test_gram_fused_cold_interpret():
    from vlgp_tpu.ops.spd import inv_one_plus_gram

    G, w, X_ref, v_ref = _gram_problem()
    X, v = inv_one_plus_gram(G, w, iters=16, force="interpret", want_v=True)
    assert np.abs(np.asarray(X) - X_ref).max() < 1e-4
    assert np.abs(np.asarray(v) - v_ref).max() < 1e-4


def test_gram_fused_matches_plain_fallback():
    """The CPU/f64 fallback path must equal the pre-fusion einsum route."""
    from vlgp_tpu.ops.spd import inv_one_plus_gram, inv_one_plus_psd

    G, w, X_ref, v_ref = _gram_problem(seed=12)
    X, v = inv_one_plus_gram(G, w, iters=16, force="xla", want_v=True)
    A = jnp.einsum("ztr,zst,ztq->zsrq", G, w, G)
    X_plain = inv_one_plus_psd(A, iters=16, force="xla")
    np.testing.assert_array_equal(np.asarray(X), np.asarray(X_plain))
    assert np.abs(np.asarray(X) - X_ref).max() < 1e-4
    assert np.abs(np.asarray(v) - v_ref).max() < 1e-4


def test_gram_fused_warm_probe_accepts_interpret():
    """A converged carried inverse must pass the probe unchanged, with v
    computed from the carry."""
    from vlgp_tpu.ops.spd import inv_one_plus_gram

    G, w, X_ref, v_ref = _gram_problem(seed=13)
    X, v = inv_one_plus_gram(
        G, w, iters=16, force="interpret", warm=jnp.asarray(X_ref),
        warm_iters=4, want_v=True,
    )
    np.testing.assert_array_equal(np.asarray(X), X_ref.astype(np.float32))
    assert np.abs(np.asarray(v) - v_ref).max() < 1e-4


def test_gram_fused_warm_garbage_falls_back_interpret():
    from vlgp_tpu.ops.spd import inv_one_plus_gram

    G, w, X_ref, v_ref = _gram_problem(seed=14)
    garbage = jnp.ones_like(jnp.asarray(X_ref)) * 50.0
    X, v = inv_one_plus_gram(
        G, w, iters=16, force="interpret", warm=garbage, warm_iters=2,
        want_v=True,
    )
    assert np.isfinite(np.asarray(X)).all()
    assert np.abs(np.asarray(X) - X_ref).max() < 1e-4
    assert np.abs(np.asarray(v) - v_ref).max() < 1e-4


def test_gram_fused_tail_masking_interpret():
    """S not divisible by the block size: the tail block's invalid slots
    must not corrupt the residual or v."""
    from vlgp_tpu.ops.spd import _ns_gram_pallas, _packed_geometry

    R = 8
    _, _, per_block, _ = _packed_geometry(1, R, tiles=16)
    S = per_block + 3  # one full block + a mostly-invalid tail block
    G, w, X_ref, v_ref = _gram_problem(Z=1, S=S, T=10, R=R, seed=15)
    X, resid, v = _ns_gram_pallas(G, w, iters=16, want_v=True,
                                  interpret=True)
    assert float(resid) < 1e-2
    assert np.abs(np.asarray(X) - X_ref).max() < 1e-3
    assert np.abs(np.asarray(v) - v_ref).max() < 1e-3
