"""On-device parity check: fused Gram+NS kernel vs the plain einsum path.

Compares X = (I + G'diag(w)G)^{-1} and v = diag(G X G') between
``inv_one_plus_gram`` (force="gram", the Mosaic-compiled kernel) and the
pre-fusion einsum route at head-to-head-like and flagship-like shapes on
whatever the default device is.  Exits nonzero on mismatch.
"""
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vlgp_tpu.ops.spd import inv_one_plus_gram, inv_one_plus_psd  # noqa: E402


def check(Z, S, T, R, seed, scale=1.0, tol=2e-3):
    rng = np.random.default_rng(seed)
    G = (rng.normal(size=(Z, T, R)) * T ** -0.5).astype(np.float32)
    w = (rng.uniform(size=(Z, S, T)) * scale).astype(np.float32)
    G, w = jnp.asarray(G), jnp.asarray(w)

    A = jnp.einsum("ztr,zst,ztq->zsrq", G, w, G,
                   precision=jax.lax.Precision.HIGHEST)
    X_plain = inv_one_plus_psd(A, iters=16)
    v_plain = jnp.einsum("ztr,zsrq,ztq->zst", G, X_plain, G,
                         precision=jax.lax.Precision.HIGHEST)

    X_f, v_f = inv_one_plus_gram(G, w, iters=16, force="gram", want_v=True)
    dx = float(jnp.max(jnp.abs(X_f - X_plain)))
    dv = float(jnp.max(jnp.abs(v_f - v_plain)))

    # oracle: residual of the fused X against the HIGHEST-precision system
    eye = jnp.eye(R, dtype=G.dtype)
    resid = float(jnp.max(jnp.abs(
        jnp.einsum("zsrq,zsqp->zsrp", A + eye, X_f,
                   precision=jax.lax.Precision.HIGHEST) - eye)))

    # warm probe path: feed the plain X as carry, must come back unchanged
    X_w, v_w = inv_one_plus_gram(G, w, iters=16, force="gram",
                                 warm=X_plain, warm_iters=4, want_v=True)
    dwx = float(jnp.max(jnp.abs(X_w - X_plain)))
    dvw = float(jnp.max(jnp.abs(v_w - v_plain)))

    ok = dx < tol and dv < tol and resid < 1e-2 and dwx < tol and dvw < tol
    print(f"Z={Z} S={S} T={T} R={R} scale={scale}: "
          f"dX={dx:.2e} dv={dv:.2e} resid={resid:.2e} "
          f"warm dX={dwx:.2e} dv={dvw:.2e} -> {'ok' if ok else 'MISMATCH'}")
    return ok


def main():
    cases = [
        (3, 100, 50, 25, 0, 1.0),    # head2head-ish (window 50)
        (5, 2000, 50, 40, 1, 1.0),   # flagship-ish
        (3, 101, 50, 25, 2, 1.0),    # ragged tail block
        (3, 100, 50, 25, 3, 50.0),   # heavier weights (later EM iters)
        (2, 64, 500, 40, 4, 1.0),    # full-trial length (VMEM-tight tiles)
    ]
    ok = all(check(*c) for c in cases)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
