"""On-device parity + smoke check for the fused E-step sweep kernel.

Builds a flagship-shaped (scaled by --segments) Poisson problem, runs one
E-step through models/vlgp.py:estep twice — VLGP_SWEEP_FUSED on (the
Pallas sweep kernel) vs off (the per-sweep composition) — and reports the
max deviations plus the kernel's residual.  Run on the real TPU.

Usage: python tools/check_sweep_fused.py [--segments 256] [--tol 0]
"""
import argparse
import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=256)
    ap.add_argument("--tol", type=float, default=None,
                    help="estep_tol override (None = default)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vlgp_tpu.config import default_config, make_params
    from vlgp_tpu.data import pack_trials
    from vlgp_tpu.models import vlgp as M
    from vlgp_tpu.models.gp import effective_rank, make_cholesky
    from vlgp_tpu.models.vlgp import estep, update_w
    from vlgp_tpu.ops import sweep as sw

    S, T, Y, Z = args.segments, 50, 100, 5
    rng = np.random.default_rng(0)
    a = (rng.normal(size=(Z, Y)) * 0.4).astype(np.float32)
    trials = []
    for _ in range(S):
        z = np.stack([np.sin(np.linspace(0, 6 + i, T)) for i in range(Z)], 1)
        y = rng.poisson(np.exp(z @ a - 2.0)).astype(np.float32)
        trials.append({"y": y,
                       "mu": (rng.normal(size=(T, Z)) * 0.1).astype(np.float32)})
    kw = {} if args.tol is None else {"estep_tol": args.tol}
    config = default_config(**kw)
    params = make_params(Y, Z, 1, "poisson", a=a,
                         b=np.full((1, Y), -2.0, np.float32),
                         omega=np.full(Z, 1e-2))
    data = pack_trials(trials, Z, 1)
    rank = min(params.rank, effective_rank(T, config.omega_bound[1], 1.0))
    G = make_cholesky(T, params, rank=rank)
    data = update_w(data, params, config)

    print(json.dumps({"eligible": sw.sweep_fused_eligible(
        data, params, G, M.Dist()),
        "bs": sw._pick_bs(Z, T, Y, G.shape[-1]),
        "rank": G.shape[-1], "backend": jax.default_backend()}))

    def run(flag):
        M._SWEEP_FUSED = flag
        fn = jax.jit(lambda d, p, g: estep(d, p, g, config,
                                           return_xinv=True))
        out, X = fn(data, params, G)
        jax.block_until_ready(out.mu)
        return out, X

    ref, Xr = run(False)
    got, Xg = run(True)
    scale = float(jnp.abs(ref.mu).max())
    rep = {
        "dmu_max": float(jnp.abs(got.mu - ref.mu).max()) / scale,
        "dw_max": float(jnp.abs(got.w - ref.w).max())
        / float(jnp.abs(ref.w).max()),
        "dv_max": float(jnp.abs(got.v - ref.v).max())
        / float(jnp.abs(ref.v).max()),
        "dX_max": float(jnp.abs(Xg - Xr).max()),
        "mu_scale": scale,
        "finite": bool(jnp.isfinite(got.mu).all()
                       & jnp.isfinite(got.w).all()
                       & jnp.isfinite(got.v).all()),
    }
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
