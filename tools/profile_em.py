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
    trials, a = make_workload()
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


def top_ops_from_trace(logdir: str, k: int = 15):
    """Parse the xplane trace into (op name, self time us) rows."""
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # pragma: no cover
        print(f"(trace parsing unavailable: {e})")
        return None
    xplanes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        print("(no xplane files found)")
        return None
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "framework_op_stats", {}
    )
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--outdir", default="/tmp/vlgp_trace")
    args = ap.parse_args()

    seg, params, G, config = setup()
    em = jax.jit(make_em_step(config, carry_xinv=True))

    xv0 = xinv_zeros(seg, G)
    lowered = em.lower(seg, params, G, xv0)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    hbm_bytes = cost.get("bytes accessed", float("nan"))

    # warm up
    d, p, g, _, xv = em(seg, params, G, xv0)
    float(jnp.sum(p.a))

    # timed run (chained, one readback)
    t0 = time.perf_counter()
    dd, pp, gg, xx = d, p, g, xv
    for _ in range(args.iters):
        dd, pp, gg, _, xx = em(dd, pp, gg, xx)
    float(jnp.sum(pp.a)) + float(jnp.sum(dd.mu))
    per_iter = (time.perf_counter() - t0) / args.iters

    # traced run
    with jax.profiler.trace(args.outdir):
        dd, pp, gg, xx = d, p, g, xv
        for _ in range(2):
            dd, pp, gg, _, xx = em(dd, pp, gg, xx)
        float(jnp.sum(pp.a))

    print(f"per-EM-iter: {per_iter*1e3:.1f} ms  ({1/per_iter:.3f} it/s)")
    print(f"XLA flops/iter: {flops:.3e}   bytes/iter: {hbm_bytes:.3e}")
    # v5e peak ~197 TFLOP/s bf16, ~98 TFLOP/s f32-ish via bf16x3;
    # use f32 number for a conservative MFU
    mfu = flops / per_iter / 98e12
    print(f"MFU (vs 98 TF/s f32): {100*mfu:.2f}%   "
          f"HBM BW used: {hbm_bytes/per_iter/1e9:.1f} GB/s (peak ~819)")

    rows = top_ops_from_trace(args.outdir)
    if rows:
        out = pathlib.Path(args.outdir) / "op_stats.json"
        out.write_text(rows if isinstance(rows, str) else json.dumps(rows))
        print(f"op stats -> {out}")


if __name__ == "__main__":
    main()
