"""Head-to-head quality gate: this engine vs the reference, on the
reference's OWN tutorial workload (notebook/tutorial.ipynb cells 9-20:
seeded Lorenz -> Poisson spikes via the *reference* simulator, 10 trials x
500 bins x 50 neurons, 3 factors, max_iter 20 / min_iter 10).

Usage:
    python tools/head2head.py            # ours (self-tuned) + cached ref
    python tools/head2head.py --ref      # (re)measure the reference fit
    python tools/head2head.py --at-ref-omegas   # ours at ref's omegas

Prints one JSON line: {"ours_r2": ..., "ref_r2": ..., "ref_omega": [...]}.
The reference number is cached in HEAD2HEAD_REF.json (it is a CPU NumPy
fit, ~4 min); the simulated data is cached in /tmp/tut_{y,x}.npy so both
fitters always see identical draws.
"""
import argparse
import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

REF_CACHE = ROOT / "HEAD2HEAD_REF.json"
Y_CACHE = pathlib.Path("/tmp/tut_y.npy")
X_CACHE = pathlib.Path("/tmp/tut_x.npy")

NTRIAL, NBIN, NNEURON, DIM = 10, 500, 50, 3


def simulate():
    """Reference tutorial cells 9-15, verbatim semantics (its NumPy RNG and
    its simulator), cached so every run sees the same draw."""
    if Y_CACHE.exists() and X_CACHE.exists():
        y, x = np.load(Y_CACHE), np.load(X_CACHE)
        # ignore stale/foreign caches at these world-shared paths
        if (y.shape == (NTRIAL, NBIN, NNEURON)
                and x.shape == (NTRIAL, NBIN, DIM)):
            return y, x
    from refshim import load_reference

    assert load_reference() is not None, "reference unavailable"
    from scipy import stats
    from vlgp import simulation

    np.random.seed(0)
    skip = 500
    lor = simulation.lorenz(
        skip + NTRIAL * NBIN, dt=5e-3, s=10, r=28, b=2.667,
        x0=np.random.random(DIM),
    )
    lor = stats.zscore(lor[skip:, :])
    x = lor.reshape((NTRIAL, NBIN, DIM))

    np.random.seed(0)
    bias = np.log(15 / NBIN)
    one = np.ones(NNEURON)
    a = (np.random.rand(DIM, NNEURON) + 1) * np.sign(
        np.random.randn(DIM, NNEURON)
    )
    b = np.vstack((bias * one, -10 * one, -10 * one, -3 * one, -3 * one,
                   -3 * one, -3 * one, -2 * one, -2 * one, -1 * one,
                   -1 * one))
    y, _, _ = simulation.spike(x, a, b)
    np.save(Y_CACHE, y)
    np.save(X_CACHE, x)
    return y, x


def r2_aligned(mu, zt):
    """lstsq-aligned R^2 with intercept (tutorial cell 22's alignment) —
    the SAME metric as the bench harness, imported so the published
    head-to-head and bench numbers cannot drift apart."""
    from bench import _r2_aligned

    return _r2_aligned(mu, zt)


def fit_reference(y, x):
    from refshim import load_reference

    assert load_reference() is not None, "reference unavailable"
    import vlgp

    np.random.seed(0)
    trials = [{"ID": i, "y": yy} for i, yy in enumerate(y)]
    fit = vlgp.fit(trials, n_factors=DIM, max_iter=20, min_iter=10)
    mu = np.concatenate([t["mu"] for t in fit["trials"]])
    zt = x.reshape(-1, DIM)
    return {
        "ref_r2": r2_aligned(mu, zt),
        "ref_omega": [float(v) for v in fit["params"]["omega"]],
        "ref_sigma": [float(v) for v in fit["params"]["sigma"]],
    }


def fit_ours(y, x, omega=None, **kw):
    import vlgp_tpu

    trials = [{"y": np.asarray(yy, float), "id": i} for i, yy in enumerate(y)]
    res = vlgp_tpu.fit(trials, DIM, max_iter=20, min_iter=10, omega=omega,
                       **kw)
    mu = np.concatenate([t["mu"] for t in res.trials])
    zt = x.reshape(-1, DIM)
    return r2_aligned(mu, zt), res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", action="store_true",
                    help="(re)measure the reference fit and cache it")
    ap.add_argument("--at-ref-omegas", action="store_true",
                    help="run ours with the reference's learned omegas "
                         "(Hstep off) instead of self-tuned")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--kw", action="append", default=[],
                    help="extra fit() kwargs as key=value (A/B config "
                         "knobs, e.g. --kw hyper_grid=0)")
    args = ap.parse_args()
    kw = {}
    for item in args.kw:
        k, v = item.split("=", 1)
        try:
            kw[k] = json.loads(v)
        except json.JSONDecodeError:
            kw[k] = v

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    y, x = simulate()

    ref = None
    if REF_CACHE.exists():
        ref = json.loads(REF_CACHE.read_text())
    if args.ref or ref is None:
        ref = fit_reference(y, x)
        REF_CACHE.write_text(json.dumps(ref, indent=1))

    if args.at_ref_omegas:
        r2, res = fit_ours(y, x, omega=np.asarray(ref["ref_omega"]),
                           Hstep=False, **kw)
        mode = "at_ref_omegas"
    else:
        r2, res = fit_ours(y, x, **kw)
        mode = "self_tuned"
    ours_omega = [float(v) for v in np.asarray(res.params.omega)]

    print(json.dumps({
        "mode": mode,
        "ours_r2": round(r2, 4),
        "ref_r2": round(ref["ref_r2"], 4),
        "ours_omega": ours_omega,
        "ref_omega": ref["ref_omega"],
        "beats_ref": bool(r2 >= ref["ref_r2"]),
    }))


if __name__ == "__main__":
    main()
