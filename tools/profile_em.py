"""Profile one fused EM step on the real TPU: device trace + top ops + MFU.

Produces (in --outdir, default /tmp/vlgp_trace):
  - a jax.profiler trace (TensorBoard/Perfetto format)
  - stdout: per-phase timings, top device ops by self time, FLOP estimate
    from XLA cost analysis, and derived MFU.

Usage: python tools/profile_em.py [--iters 4] [--outdir /tmp/vlgp_trace]
"""
import argparse
import glob
import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_workload, NTRIAL, LENGTH, YDIM, ZDIM  # noqa: E402
from vlgp_tpu.config import default_config, make_params  # noqa: E402
from vlgp_tpu.data import cut_trials, pack_trials  # noqa: E402
from vlgp_tpu.models.driver import make_em_step, xinv_zeros  # noqa: E402
from vlgp_tpu.models.gp import effective_rank, make_cholesky  # noqa: E402
from vlgp_tpu.models.vlgp import update_w  # noqa: E402


def setup():
    trials, a, _ = make_workload()
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
    return seg, params, G, config


def top_ops_from_trace(logdir: str, k: int = 20):
    """Aggregate device-op self-times from the Chrome-trace export.

    Returns (rows, device_total_ms) with rows = [(total_ms, count, name)].
    """
    import collections
    import gzip

    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("(no trace.json.gz found)")
        return None, None
    tr = json.loads(gzip.open(files[-1]).read())
    events = tr["traceEvents"]
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg, cnt = collections.Counter(), collections.Counter()
    modtot = 0.0
    for e in events:
        if e.get("ph") != "X" or not pids.get(e["pid"], "").startswith("/device"):
            continue
        tname = tids.get((e["pid"], e.get("tid")))
        if tname == "XLA Ops":
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
        elif tname == "XLA Modules":
            modtot += e.get("dur", 0)
    rows = [(d / 1e3, cnt[n], n) for n, d in agg.most_common(k)]
    return rows, modtot / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--outdir", default="/tmp/vlgp_trace")
    args = ap.parse_args()

    seg, params, G, config = setup()
    raw = make_em_step(config, carry_xinv=True)
    # thread the iteration index so the profiled cadence matches the
    # shipped default (hyper_interval=2: trace shows one H-on and one
    # H-off iteration); the index rides the in-graph uniform cond
    em = jax.jit(lambda d, p, g, xv, it: raw(d, p, g, xv, it=it))

    xv0 = xinv_zeros(seg, G)
    lowered = em.lower(seg, params, G, xv0, 0)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    hbm_bytes = cost.get("bytes accessed", float("nan"))

    # warm up
    d, p, g, _, xv = em(seg, params, G, xv0, 0)
    float(jnp.sum(p.a))

    # timed run (chained, one readback)
    t0 = time.perf_counter()
    dd, pp, gg, xx = d, p, g, xv
    for i in range(args.iters):
        dd, pp, gg, _, xx = em(dd, pp, gg, xx, i)
    float(jnp.sum(pp.a)) + float(jnp.sum(dd.mu))
    per_iter = (time.perf_counter() - t0) / args.iters

    # traced run
    with jax.profiler.trace(args.outdir):
        dd, pp, gg, xx = d, p, g, xv
        for i in range(2):
            dd, pp, gg, _, xx = em(dd, pp, gg, xx, i)
        float(jnp.sum(pp.a))

    print(f"per-EM-iter: {per_iter*1e3:.1f} ms  ({1/per_iter:.3f} it/s)")
    # cost_analysis counts the hyper_interval cond's H branch, so these
    # are per H-ON iteration; the amortized per_iter divides an H-on/H-off
    # mix -> MFU/BW below are upper bounds at interval > 1
    print(f"XLA flops/H-on-iter: {flops:.3e}   bytes/H-on-iter: {hbm_bytes:.3e}")
    # v5e peak ~197 TFLOP/s bf16, ~98 TFLOP/s f32-ish via bf16x3;
    # use f32 number for a conservative MFU
    mfu = flops / per_iter / 98e12
    print(f"MFU upper bound (vs 98 TF/s f32): {100*mfu:.2f}%   "
          f"HBM BW <= {hbm_bytes/per_iter/1e9:.1f} GB/s (peak ~819)")

    rows, modtot = top_ops_from_trace(args.outdir)
    if rows:
        lines = [
            "# TRACE — one fused EM step on the real TPU (flagship config)",
            "",
            f"Workload: {NTRIAL} trials x {LENGTH} bins x {YDIM} neurons x "
            f"{ZDIM} latents (2000 window-50 segments), default budget.",
            "Collected by `python tools/profile_em.py` (jax.profiler trace "
            "of 2 EM iterations; raw trace under the --outdir).",
            "",
            "NOTE on the wall figure: this probe dispatches each EM "
            "iteration separately through a REMOTE-ATTACHED TPU (axon "
            "tunnel), so wall - device is tunnel dispatch/readback latency, "
            "not compute, and wall figures are not comparable across "
            "collection environments.  Compare the device-time line across "
            "rounds; bench.py (scan driver, 10 iterations per dispatch) is "
            "the honest wall-clock number.",
            "",
            f"- per-EM-iteration wall: {per_iter*1e3:.1f} ms "
            f"({1/per_iter:.2f} it/s)",
            f"- device (XLA module) time: {modtot/2:.1f} ms/iter",
            f"- XLA-counted flops: {flops:.2e} per H-on iteration (cost "
            "analysis counts the hyper_interval cond's H branch; H-off "
            "iterations execute less) -> MFU upper bound "
            f"{100*flops/per_iter/98e12:.2f}% of 98 TF/s f32 "
            "(excludes flops inside the Pallas NS kernel; the step is "
            "latency/bandwidth-bound by design, not FLOP-bound)",
            f"- HBM bytes: {hbm_bytes:.2e} per H-on iteration -> "
            f"<= {hbm_bytes/per_iter/1e9:.0f} GB/s of ~819 peak",
            "",
            "Top device ops by total self time (2 EM iterations):",
            "",
            "| total ms | count | op |",
            "|---:|---:|---|",
        ]
        for ms, c, name in rows:
            lines.append(f"| {ms:.2f} | {c} | `{name[:70]}` |")
        out = pathlib.Path(__file__).resolve().parents[1] / "TRACE.md"
        out.write_text("\n".join(lines) + "\n")
        print(f"trace summary -> {out}")


if __name__ == "__main__":
    main()
