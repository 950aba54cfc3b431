"""Generalization check for the head-to-head configuration: an INDEPENDENT
draw of the reference tutorial workload (different simulator seed, same
shapes/budget), fit by both engines.

Guards against tuning the omega-init/H-step defaults to the single seeded
benchmark draw that tools/head2head.py scores.  Usage:

    python tools/indep_draw.py [--seed 1] [--ref]

--ref (re)measures the reference fit for the seed (CPU NumPy, ~4 min) and
caches it in INDEP_DRAW_REF.json; without it only ours runs.
"""
import argparse
import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))
sys.path.insert(0, str(ROOT / "tools"))

from head2head import DIM, NBIN, NNEURON, NTRIAL, fit_ours, r2_aligned  # noqa: E402

REF_CACHE = ROOT / "INDEP_DRAW_REF.json"


def simulate(seed):
    """head2head.simulate with a different RNG seed (fresh Lorenz initial
    condition, loading matrix, and spike draw)."""
    from refshim import load_reference

    assert load_reference() is not None, "reference unavailable"
    from scipy import stats
    from vlgp import simulation

    np.random.seed(seed)
    skip = 500
    lor = simulation.lorenz(
        skip + NTRIAL * NBIN, dt=5e-3, s=10, r=28, b=2.667,
        x0=np.random.random(DIM),
    )
    lor = stats.zscore(lor[skip:, :])
    x = lor.reshape((NTRIAL, NBIN, DIM))
    bias = np.log(15 / NBIN)
    one = np.ones(NNEURON)
    a = (np.random.rand(DIM, NNEURON) + 1) * np.sign(
        np.random.randn(DIM, NNEURON)
    )
    b = np.vstack((bias * one, -10 * one, -10 * one, -3 * one, -3 * one,
                   -3 * one, -3 * one, -2 * one, -2 * one, -1 * one,
                   -1 * one))
    y, _, _ = simulation.spike(x, a, b)
    return y, x


def fit_reference(y, x):
    from refshim import load_reference

    assert load_reference() is not None, "reference unavailable"
    import vlgp

    np.random.seed(0)
    trials = [{"ID": i, "y": yy} for i, yy in enumerate(y)]
    fit = vlgp.fit(trials, n_factors=DIM, max_iter=20, min_iter=10)
    mu = np.concatenate([t["mu"] for t in fit["trials"]])
    return {
        "ref_r2": r2_aligned(mu, x.reshape(-1, DIM)),
        "ref_omega": [float(v) for v in fit["params"]["omega"]],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--at-ref-omegas", action="store_true",
                    help="run ours with the reference's learned omegas "
                         "(Hstep off) — requires a dict-format cache entry")
    ap.add_argument("--kw", action="append", default=[],
                    help="extra fit() kwargs as key=value (A/B knobs)")
    args = ap.parse_args()
    kw = {}
    for item in args.kw:
        k, v = item.split("=", 1)
        try:
            kw[k] = json.loads(v)
        except json.JSONDecodeError:
            kw[k] = v

    y, x = simulate(args.seed)
    cache = {}
    if REF_CACHE.exists():
        cache = json.loads(REF_CACHE.read_text())
    key = str(args.seed)
    # cache schema: float (r2 only, legacy) or {"ref_r2", "ref_omega"}
    if args.ref and (key not in cache or not isinstance(cache[key], dict)):
        cache[key] = fit_reference(y, x)
        REF_CACHE.write_text(json.dumps(cache))
    entry = cache.get(key)
    ref_r2 = entry["ref_r2"] if isinstance(entry, dict) else entry

    if args.at_ref_omegas:
        # fail-loud preconditions (ADVICE-r3): no silent --kw override, no
        # bare assert (stripped under python -O) — match head2head.py
        if not isinstance(entry, dict):
            ap.error("need --ref first (omegas uncached for this seed)")
        conflicting = sorted({"omega", "Hstep"} & kw.keys())
        if conflicting:
            ap.error(
                "--at-ref-omegas sets {} itself; drop the conflicting "
                "--kw".format("/".join(conflicting))
            )
        kw = dict(kw, omega=np.asarray(entry["ref_omega"]), Hstep=False)
    r2, res = fit_ours(y, x, **kw)
    out = {
        "seed": args.seed,
        "ours_r2": round(r2, 4),
        "ours_omega": [float(v) for v in np.asarray(res.params.omega)],
    }
    if args.at_ref_omegas:
        out["mode"] = "at_ref_omegas"
    if ref_r2 is not None:
        out["ref_r2"] = round(ref_r2, 4)
        out["beats_ref"] = bool(r2 >= ref_r2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
