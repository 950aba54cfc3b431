"""Benchmark: EM iterations/sec on the BASELINE.json flagship config.

Workload (BASELINE.md "Large-scale"): 100 trials x 1000 bins x 100 Poisson
neurons, 5 latents, default algorithmic budget (Eniter 25 / Mniter 25 /
rank 50 / window 50) -> 2000 training segments of 50 bins.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "iter/s", "vs_baseline": N}

vs_baseline is the speedup over the reference NumPy implementation's
per-EM-iteration wall clock on this host's CPU (measured once and cached
in BASELINE_MEASURED.json; the reference needs a scipy>=1.11 compat shim
for its removed `sym_pos` kwarg).
"""
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NTRIAL, LENGTH, YDIM, ZDIM = 100, 1000, 100, 5
CACHE = ROOT / "BASELINE_MEASURED.json"


QUALITY_R2 = 0.95  # convergence threshold for the seconds_to_converged metric


def make_workload(dtype=np.float32):
    rng = np.random.default_rng(0)
    a = (rng.normal(size=(ZDIM, YDIM)) * 0.3).astype(dtype)
    trials, zs = [], []
    for _ in range(NTRIAL):
        z = np.stack(
            [np.sin(np.linspace(0, 20 + 3 * i, LENGTH)) for i in range(ZDIM)], 1
        )
        y = rng.poisson(np.exp(z @ a - 2.0)).astype(dtype)
        trials.append(
            {"y": y, "mu": (rng.normal(size=(LENGTH, ZDIM)) * 0.1).astype(dtype)}
        )
        zs.append(z)
    return trials, a, np.concatenate(zs)


def _r2_aligned(mu, zt):
    X = np.column_stack([mu, np.ones(len(mu))])
    beta, *_ = np.linalg.lstsq(X, zt, rcond=None)
    return float(1 - np.sum((X @ beta - zt) ** 2)
                 / np.sum((zt - zt.mean(0)) ** 2))


def bench_ours(trials, a, zt, iters=10):
    import jax
    import jax.numpy as jnp

    from vlgp_tpu.config import default_config, make_params
    from vlgp_tpu.data import cut_trials, pack_trials, scatter_segments
    from vlgp_tpu.models.driver import _scan_em_jit, make_em_step, xinv_zeros
    from vlgp_tpu.models.gp import effective_rank, make_cholesky
    from vlgp_tpu.models.vlgp import update_w

    config = default_config()
    params = make_params(
        YDIM, ZDIM, 1, "poisson", a=a,
        b=np.full((1, YDIM), -2.0, np.float32), omega=np.full(ZDIM, 1e-2),
    )
    data = pack_trials(trials, ZDIM, 1)
    seg = cut_trials(data, config.window, seed=0)
    seg_rank = min(params.rank,
                   effective_rank(seg.nbin, config.omega_bound[1], 1.0))
    G = make_cholesky(seg.nbin, params, rank=seg_rank)
    seg = update_w(seg, params, config)
    # production driver shape: `iters` EM iterations scanned into one
    # device dispatch (api.fit(fused=True, block=k))
    em = _scan_em_jit(config, iters)

    # warmup/compile; the trailing host readback (not just
    # block_until_ready) forces the device timeline to drain — necessary on
    # remote-attached devices where blocking can return early
    xv0 = xinv_zeros(seg, G)
    d, p, g, xv, _ = em(seg, params, G, xv0)
    float(jnp.sum(p.a))

    def run(n):
        assert n == iters
        t0 = time.perf_counter()
        dd, pp, gg, _, norms = em(d, p, g, xv)
        checksum = float(jnp.sum(pp.a)) + float(jnp.sum(dd.mu))
        assert np.isfinite(checksum)
        return (time.perf_counter() - t0) / n

    run(iters)  # second warmup (cache effects)
    per_iter = min(run(iters), run(iters))

    # ---- seconds_to_converged + quality (BASELINE.json's full metric) ----
    # restart from the initial state and run timed blocks until the
    # lstsq-aligned latent-recovery R^2 crosses QUALITY_R2.  Scoring runs
    # the full fit ending (scatter + full-length inference under the
    # current params, api.py:66-71) so the metric reflects what `fit`
    # would deliver if stopped at that iteration; the score probes are
    # untimed, but the one final inference that produces the converged
    # deliverable is counted.  (The reference-side measurement,
    # tools/ref_convergence.py, scores its raw trial posterior without a
    # final inference pass — a concession in ITS favor.)
    from vlgp_tpu.models.driver import _infer_jit, _jit_key
    from vlgp_tpu.models.vlgp import Dist, update_v

    dd, pp, gg, xvv = seg, params, G, xv0
    full = pack_trials(trials, ZDIM, 1)
    infer_fn = _infer_jit(_jit_key(config), config.max_iter, Dist())

    def score(dd, pp):
        # scatter reads only mu/w/v from the segments (no y/x readback)
        scat = scatter_segments(full, dd)
        G_full = make_cholesky(full.nbin, pp)
        scat = update_w(scat, pp, config)
        scat = update_v(scat, pp, G_full, config)
        scat = infer_fn(scat, pp, G_full)
        mu = np.asarray(scat.mu).reshape(-1, ZDIM)
        return _r2_aligned(mu, zt), scat

    total, it_count, r2 = 0.0, 0, float("nan")
    while it_count < 80:
        t0 = time.perf_counter()
        dd, pp, gg, xvv, _ = em(dd, pp, gg, xvv)
        checksum = float(jnp.sum(dd.mu))
        assert np.isfinite(checksum)
        total += time.perf_counter() - t0
        it_count += iters
        r2, _ = score(dd, pp)
        if r2 >= QUALITY_R2:
            break
    # the deliverable includes one final inference: time it once
    t0 = time.perf_counter()
    _, scat = score(dd, pp)
    jax.block_until_ready(scat.mu)
    total += time.perf_counter() - t0
    return per_iter, total, it_count, r2


def bench_reference(trials):
    """One reference EM iteration (estep+mstep+hstep on segments), CPU."""
    sys.path.insert(0, str(ROOT / "tests"))
    from refshim import load_reference

    ref = load_reference()
    if ref is None:
        return None
    from vlgp.core import constrain_loading, estep, mstep, update_v, update_w
    from vlgp.gp import make_cholesky, optimize
    from vlgp.preprocess import fill_params, fill_trials, get_config, get_params
    from vlgp.util import cut_trials

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
    fill_params(params)
    fill_trials(ref_trials)
    np.random.seed(0)
    splits = cut_trials(ref_trials, params, config)
    make_cholesky(splits, params, config)
    fill_trials(splits)
    update_w(splits, params, config)
    update_v(splits, params, config)

    t0 = time.perf_counter()
    constrain_loading(splits, params, config)
    estep(splits, params, config)
    mstep(splits, params, config)
    optimize(splits, params, config)
    return time.perf_counter() - t0


def main():
    trials, a, zt = make_workload()
    per_iter, sec_conv, it_conv, r2 = bench_ours(trials, a, zt)
    value = 1.0 / per_iter

    cache = {}
    if CACHE.exists():
        try:
            cache = json.loads(CACHE.read_text())
        except Exception:
            cache = {}
    baseline = cache.get("ref_em_iter_seconds")
    if baseline is None:
        try:
            baseline = bench_reference(trials)
            if baseline is not None:
                cache.update(
                    ref_em_iter_seconds=baseline,
                    config=f"{NTRIAL}x{LENGTH}x{YDIM}, {ZDIM} latents, "
                           "window 50, Eniter/Mniter 25",
                )
                CACHE.write_text(json.dumps(cache))
        except Exception:
            baseline = None

    vs = (baseline / per_iter) if baseline else None
    out = {
        "metric": f"vem_em_iters_per_sec_{NTRIAL}x{LENGTH}x{YDIM}x{ZDIM}",
        "value": round(value, 4),
        "unit": "iter/s",
        "vs_baseline": round(vs, 2) if vs else None,
        # BASELINE.json's full driver metric: wall-clock to a fixed
        # recovery threshold, plus the quality number itself
        "seconds_to_converged": round(sec_conv, 3),
        "converged_iters": it_conv,
        "quality_r2": round(r2, 4),
        "quality_threshold": QUALITY_R2,
        # honest-flag: seconds_to_converged is the 80-iteration-cap time,
        # not a convergence time, whenever this is false (the reference
        # measurement records ref_converged the same way)
        "converged": bool(r2 >= QUALITY_R2),
    }
    # the reference's own convergence numbers on this workload, measured
    # once by tools/ref_convergence.py and cached
    for k in ("ref_seconds_to_converged", "ref_converged_iters",
              "ref_quality_r2"):
        if k in cache:
            out[k] = cache[k]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
