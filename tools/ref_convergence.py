"""Measure the reference's wall-clock-to-convergence on the flagship
bench workload (one-time, cached into BASELINE_MEASURED.json).

The reference runs at ~250 s per EM iteration on this host's CPU, so this
takes hours; progress is checkpointed into the cache after every iteration
(ref_seconds_to_converged / ref_converged_iters / ref_quality_r2 reflect
the first iteration whose lstsq-aligned R^2 crosses bench.QUALITY_R2, or
the last completed iteration otherwise, with ref_converged: false).

Run: nice -n 19 python tools/ref_convergence.py [max_iters]
"""
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

from bench import CACHE, NTRIAL, LENGTH, YDIM, ZDIM, QUALITY_R2, _r2_aligned, make_workload  # noqa: E402


def main(max_iters=45):
    from refshim import load_reference

    assert load_reference() is not None, "reference unavailable"
    from vlgp.core import constrain_loading, estep, mstep, update_v, update_w
    from vlgp.gp import make_cholesky, optimize
    from vlgp.preprocess import fill_params, fill_trials, get_config, get_params
    from vlgp.util import cut_trials

    trials, a, zt = make_workload()
    ref_trials = [
        {"y": np.asarray(t["y"], float), "mu": np.asarray(t["mu"], float),
         "x": np.ones((LENGTH, 1, YDIM))}
        for t in trials
    ]
    config = get_config()
    params = get_params(ref_trials, ZDIM, omega_bound=config["omega_bound"])
    rng = np.random.default_rng(0)
    params["a"] = rng.normal(size=(ZDIM, YDIM)) * 0.3
    params["b"] = np.full((1, YDIM), -2.0)
    params["omega"] = np.full(ZDIM, 1e-2)  # same start as bench_ours
    fill_params(params)
    fill_trials(ref_trials)
    np.random.seed(0)
    splits = cut_trials(ref_trials, params, config)
    make_cholesky(splits, params, config)
    fill_trials(splits)
    update_w(splits, params, config)
    update_v(splits, params, config)

    cache = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    total = 0.0
    r2 = float("nan")
    for it in range(1, max_iters + 1):
        tic = time.perf_counter()
        constrain_loading(splits, params, config)
        estep(splits, params, config)
        mstep(splits, params, config)
        optimize(splits, params, config)
        total += time.perf_counter() - tic
        # splits are views into ref_trials: the parents' mu is live
        mu = np.concatenate([t["mu"] for t in ref_trials])
        r2 = _r2_aligned(mu, zt)
        converged = r2 >= QUALITY_R2
        cache.update(
            ref_seconds_to_converged=round(total, 1),
            ref_converged_iters=it,
            ref_quality_r2=round(r2, 4),
            ref_converged=bool(converged),
            ref_quality_threshold=QUALITY_R2,
        )
        CACHE.write_text(json.dumps(cache))
        print(f"iter {it}: {total:.0f}s cumulative, R2 {r2:.4f}", flush=True)
        if converged:
            break
    print(json.dumps(cache))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 45)
