"""VEM outer loop and fused EM step.

Reference: ``vem`` (core.py:269-363) — per iteration:
constrain_loading -> E-step -> constrain_latent -> M-step -> H-step,
with per-phase wall-clock timers, a callback hook, and a relative-norm
convergence test guarded by ``min_iter``.

Two execution styles are provided:

  * :func:`vem` — a host loop over separately-jitted phases, preserving the
    reference's per-phase ``runtime`` telemetry and callback hook;
  * :func:`make_em_step` — the whole EM iteration fused into one function
    (for benchmarks, `lax`-style scanning, and the shard_map SPMD path).
"""
from __future__ import annotations

import functools
import time
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config, Params
from ..data import TrialSet
from ..utils.profiling import annotate
from .gp import hstep, make_cholesky
from .vlgp import (
    Dist,
    constrain_latent,
    constrain_loading,
    em_norms,
    estep,
    mstep,
    update_v,
    update_w,
)

__all__ = ["vem", "infer", "make_em_step"]


def make_em_step(config: Config, dist: Dist = Dist(),
                 carry_xinv: bool = False) -> Callable:
    """Build a fused single-EM-iteration function.

    (data, params, G) -> (data, params, G, norms) with ``norms`` holding the
    squared norms for the convergence test (pre-step mu/a/b, post-step
    dmu/da/db — matching core.py:300-305 and core.py:350-354).

    With ``carry_xinv`` the step takes and returns an extra (Z, S, R, R)
    operand: the E-step's final Woodbury inverses, which warm-start the next
    iteration's first sweep (initialize with zeros — the residual probe
    routes a useless carry to the cold start).  This removes the one
    remaining cold Newton-Schulz solve per EM iteration.
    """

    def em_step(data: TrialSet, params: Params, G: jnp.ndarray, xinv=None,
                it=None):
        pre = em_norms(data, params, dist)
        data, params = constrain_loading(data, params, config, dist)
        if carry_xinv:
            data, xinv = estep(data, params, G, config, dist=dist,
                               xinv=xinv, return_xinv=True)
        else:
            data = estep(data, params, G, config, dist=dist)
        data, params = constrain_latent(data, params, config, dist)
        params = mstep(data, params, config, dist=dist)
        if config.Hstep:
            interval = max(1, int(config.hyper_interval))

            def _h(p, g):
                p = hstep(data, p, config, dist, rank=g.shape[-1],
                          xinv=xinv)
                return p, make_cholesky(data.nbin, p, rank=g.shape[-1])

            if interval > 1 and it is not None:
                # uniform predicate (the iteration index is replicated),
                # so shard_mapped devices take the same branch and the
                # H-step's data-axis psums can't deadlock
                params, G = lax.cond(
                    it % interval == 0, _h, lambda p, g: (p, g), params, G
                )
            else:
                params, G = _h(params, G)
        post = em_norms(data, params, dist)
        norms = dict(
            mu=pre["mu"], a=pre["a"], b=pre["b"],
            dmu=post["dmu"], da=post["da"], db=post["db"],
        )
        if carry_xinv:
            return data, params, G, norms, xinv
        return data, params, G, norms

    return em_step


def xinv_zeros(data: TrialSet, G: jnp.ndarray) -> jnp.ndarray:
    """Initial (useless) inverse carry for a ``carry_xinv=True`` EM step."""
    Z, _, R = G.shape
    return jnp.zeros((Z, data.ntrial, R, R), data.mu.dtype)


def _jit_key(config: Config) -> Config:
    """Strip host-only fields (checkpoint path/interval, PRNG seed, ELBO
    tracking) so jit caches don't miss — and, worse, evict live entries —
    across seed sweeps or per-run checkpoint paths.  None of these fields
    enters a traced graph (the ELBO trajectory is computed host-side
    between dispatches)."""
    return config.replace(path=None, saving_interval=1800.0, seed=0,
                          track_elbo=False, convergence="norms")


@functools.lru_cache(maxsize=32)
def _vem_phases(config: Config, T: int):
    """Jitted VEM phase functions, cached on (static config, trial length).

    Fresh-lambda-in-jit per call was a verified recompile hotspot (VERDICT
    r1): repeated ``vem``/``transform``/CV sweeps at the same shapes paid a
    full compile each.  jax.jit keeps its own executable cache *per Python
    callable*, so the callables themselves must be reused.
    """

    @jax.jit
    def phase_e(d, p, g, xv):
        n0 = em_norms(d, p)
        d, p = constrain_loading(d, p, config)
        d, xv = estep(d, p, g, config, xinv=xv, return_xinv=True)
        return d, p, n0, xv

    @jax.jit
    def phase_m(d, p):
        d, p = constrain_latent(d, p, config)
        p = mstep(d, p, config)
        return d, p

    @jax.jit
    def phase_h(d, p, g, xv):
        if config.Hstep:
            p = hstep(d, p, config, rank=g.shape[-1], xinv=xv)
            g = make_cholesky(T, p, rank=g.shape[-1])
        return p, g

    @jax.jit
    def phase_norms(d, p):
        return em_norms(d, p)

    return phase_e, phase_m, phase_h, phase_norms


@functools.lru_cache(maxsize=32)
def _fused_em_jit(config: Config):
    return jax.jit(make_em_step(config, carry_xinv=True))


@functools.lru_cache(maxsize=32)
def _scan_em_jit(config: Config, k: int, dist: Dist = Dist()):
    """k EM iterations as ONE dispatch (lax.scan over the fused step).

    On a remote-attached TPU each dispatch costs ~15-20 ms of tunnel
    latency; scanning k steps amortizes it.  Returns per-step norms
    stacked (k,) so the host still sees every iteration's convergence
    numbers at the chunk boundary.
    """
    em = make_em_step(config, dist, carry_xinv=True)

    @jax.jit
    def run(data, params, G, xinv, it0=0):
        def body(carry, i):
            data, params, G, xinv = carry
            data, params, G, norms, xinv = em(data, params, G, xinv, it=i)
            return (data, params, G, xinv), norms

        (data, params, G, xinv), norms = lax.scan(
            body, (data, params, G, xinv), it0 + jnp.arange(k)
        )
        return data, params, G, xinv, norms

    return run


@functools.lru_cache(maxsize=64)
def _infer_jit(config: Config, niter: int, dist: Dist):
    return jax.jit(
        lambda d, p, g: estep(d, p, g, config, niter=niter, dist=dist)
    )


@functools.lru_cache(maxsize=32)
def _mstep_jit(config: Config):
    return jax.jit(lambda d, p: mstep(d, p, config))


def _converged(norms, tol: float) -> bool:
    """norm(d.) < tol * norm(.) for mu, a, b (squared-norm form,
    core.py:354)."""
    t2 = tol * tol
    return bool(
        (norms["dmu"] < t2 * norms["mu"])
        & (norms["da"] < t2 * norms["a"])
        & (norms["db"] < t2 * norms["b"])
    )


def _track_elbo(config: Config) -> bool:
    return config.track_elbo or config.convergence == "elbo"


def _elbo_record(runtime: dict, data, params, G) -> None:
    """Append this iteration's ELBO (and its terms) to the runtime dict."""
    from ..evaluation import elbo_terms

    terms = elbo_terms(data, params, G)
    runtime.setdefault("elbo", []).append(terms["elbo"])
    runtime.setdefault("elbo_terms", []).append(terms)


def _final_hstep(data, params, G, xinv, config: Config, runtime: dict):
    """Closing H-step for ``hyper_interval > 1`` (ADVICE-r4).

    When the loop exits (convergence or ``max_iter``) on an iteration whose
    H-step was skipped, the returned omega/sigma were last refreshed up to
    ``interval - 1`` iterations earlier against a stale posterior; the
    reference always ends an iteration with its H-step (core.py:329-339).
    Run one H-step against the final posterior so the returned
    hyperparameters are fresh; records ``runtime["final_hstep"] = True``.
    """
    interval = int(config.hyper_interval)
    if not (config.Hstep and interval > 1 and runtime["it"] > 0):
        return params, G
    if (runtime["it"] - 1) % interval == 0:  # last iteration ran its H-step
        return params, G
    phase_h = _vem_phases(_jit_key(config), data.nbin)[2]
    with annotate("vlgp:hstep"):
        params, G = phase_h(data, params, G, xinv)
        jax.block_until_ready(params.omega)
    runtime["final_hstep"] = True
    return params, G


def _iter_converged(runtime: dict, norms, config: Config) -> bool:
    """Dispatch the convergence test per config.convergence: the
    reference's relative-update-norms check (core.py:350-359), or an ELBO
    stall |dELBO| <= tol * |ELBO| on the tracked trajectory."""
    if config.convergence == "elbo":
        e = runtime.get("elbo", [])
        if len(e) < 2:
            return False
        return abs(e[-1] - e[-2]) <= config.tol * abs(e[-1])
    return _converged(norms, config.tol)


def vem(
    data: TrialSet,
    params: Params,
    G: jnp.ndarray,
    config: Config,
    callbacks: Sequence[Callable] = (),
    verbose: bool = False,
    fused: bool = False,
    block: int = 1,
) -> Tuple[TrialSet, Params, jnp.ndarray, dict]:
    """Variational EM loop with per-phase timing (core.py:269-363).

    ``fused=True`` runs the whole EM iteration as one jitted graph (one
    dispatch + one compile instead of four) — per-phase timings then all
    land in ``em_elapsed``.  ``block=k`` (k > 1 — implies ``fused``)
    additionally scans k iterations per dispatch, amortizing the
    per-dispatch latency of remote-attached devices; convergence is then
    checked (and callbacks fire) at block boundaries, which matches the
    reference's effective behavior for the default ``min_iter=5`` when k
    divides it.  Returns (data, params, G, runtime); once the convergence
    test first passes, ``runtime["converged_at"]`` records that iteration
    index (1-based) — in block mode ``runtime["it"]`` keeps counting
    through the remainder of the block, so compare ``converged_at`` across
    driver modes, not ``it``.
    """
    if block > 1:  # scanning implies the fused step
        return _vem_scan(data, params, G, config, callbacks, verbose, block)
    if fused:
        return _vem_fused(data, params, G, config, callbacks, verbose)
    phase_e, phase_m, phase_h, phase_norms = _vem_phases(_jit_key(config), data.nbin)

    runtime = {"it": 0, "e_elapsed": [], "m_elapsed": [], "h_elapsed": [], "em_elapsed": []}
    xinv = xinv_zeros(data, G)
    interval = max(1, int(config.hyper_interval))

    for it in range(config.max_iter):
        runtime["it"] += 1
        tic_em = time.perf_counter()

        tic = time.perf_counter()
        with annotate("vlgp:estep"):
            data, params, pre, xinv = phase_e(data, params, G, xinv)
            jax.block_until_ready(data.mu)
        runtime["e_elapsed"].append(time.perf_counter() - tic)

        tic = time.perf_counter()
        with annotate("vlgp:mstep"):
            data, params = phase_m(data, params)
            jax.block_until_ready(params.a)
        runtime["m_elapsed"].append(time.perf_counter() - tic)

        tic = time.perf_counter()
        if it % interval == 0:  # host-side hyper_interval gate
            with annotate("vlgp:hstep"):
                params, G = phase_h(data, params, G, xinv)
                jax.block_until_ready(params.omega)
        runtime["h_elapsed"].append(time.perf_counter() - tic)

        runtime["em_elapsed"].append(time.perf_counter() - tic_em)

        if verbose:
            print(
                f"Iteration {runtime['it']:4d}, "
                f"E-step {runtime['e_elapsed'][-1]:.2f}s, "
                f"M-step {runtime['m_elapsed'][-1]:.2f}s"
            )

        for cb in callbacks:
            try:
                cb(data, params, config)
            except RuntimeError:  # reference swallows these (core.py:341-345)
                pass

        post = phase_norms(data, params)
        norms = {
            "mu": float(pre["mu"]), "a": float(pre["a"]), "b": float(pre["b"]),
            "dmu": float(post["dmu"]), "da": float(post["da"]), "db": float(post["db"]),
        }
        if _track_elbo(config):
            _elbo_record(runtime, data, params, G)
        if _iter_converged(runtime, norms, config) and it + 1 >= config.min_iter:
            runtime["converged_at"] = runtime["it"]
            break

    params, G = _final_hstep(data, params, G, xinv, config, runtime)
    return data, params, G, runtime


def _vem_fused(data, params, G, config, callbacks, verbose):
    em = _fused_em_jit(_jit_key(config))
    runtime = {"it": 0, "e_elapsed": [], "m_elapsed": [], "h_elapsed": [],
               "em_elapsed": []}
    xinv = xinv_zeros(data, G)
    for it in range(config.max_iter):
        runtime["it"] += 1
        tic = time.perf_counter()
        # it rides the in-graph hyper_interval cond; at interval=1 the
        # predicate short-circuits at trace time and the operand is dead
        data, params, G, norms, xinv = em(data, params, G, xinv, it)
        norms = {k: float(v) for k, v in norms.items()}
        runtime["em_elapsed"].append(time.perf_counter() - tic)
        if verbose:
            print(f"Iteration {runtime['it']:4d}, "
                  f"EM {runtime['em_elapsed'][-1]:.2f}s")
        for cb in callbacks:
            try:
                cb(data, params, config)
            except RuntimeError:
                pass
        if _track_elbo(config):
            _elbo_record(runtime, data, params, G)
        if _iter_converged(runtime, norms, config) and it + 1 >= config.min_iter:
            runtime["converged_at"] = runtime["it"]
            break
    params, G = _final_hstep(data, params, G, xinv, config, runtime)
    return data, params, G, runtime


def _vem_scan(data, params, G, config, callbacks, verbose, block):
    runtime = {"it": 0, "e_elapsed": [], "m_elapsed": [], "h_elapsed": [],
               "em_elapsed": []}
    xinv = xinv_zeros(data, G)
    run = _scan_em_jit(_jit_key(config), block)
    done = False
    while runtime["it"] < config.max_iter and not done:
        k = min(block, config.max_iter - runtime["it"])
        step = run if k == block else _scan_em_jit(_jit_key(config), k)
        tic = time.perf_counter()
        data, params, G, xinv, norms_k = step(data, params, G, xinv,
                                              runtime["it"])
        norms_k = {key: list(map(float, v)) for key, v in norms_k.items()}
        elapsed = time.perf_counter() - tic
        for i in range(k):
            runtime["it"] += 1
            runtime["em_elapsed"].append(elapsed / k)
            norms = {key: norms_k[key][i] for key in norms_k}
            if (config.convergence == "norms" and _converged(norms, config.tol)
                    and runtime["it"] >= config.min_iter and not done):
                # ADVICE-r2: `it` keeps counting through the block remainder
                # after mid-block convergence; this is the comparable index
                runtime["converged_at"] = runtime["it"]
                done = True
        if _track_elbo(config):
            # per-BLOCK trajectory in scan mode (the intra-block state
            # never leaves the device); the elbo convergence test fires at
            # block boundaries accordingly
            _elbo_record(runtime, data, params, G)
            if (config.convergence == "elbo" and not done
                    and runtime["it"] >= config.min_iter
                    and _iter_converged(runtime, {}, config)):
                runtime["converged_at"] = runtime["it"]
                done = True
        if verbose:
            print(f"Iteration {runtime['it']:4d}, "
                  f"EM {elapsed / k:.2f}s/it (block {k})")
        for cb in callbacks:
            try:
                cb(data, params, config)
            except RuntimeError:
                pass
    params, G = _final_hstep(data, params, G, xinv, config, runtime)
    return data, params, G, runtime


def infer(
    data: TrialSet,
    params: Params,
    G: jnp.ndarray,
    config: Config,
    dist: Dist = Dist(),
) -> TrialSet:
    """Inference-only pass: E-step run for ``max_iter`` sweeps
    (core.py:260-266, which temporarily rebinds Eniter).  The jitted
    callable is cached on (config, dist): repeated ``transform``/CV calls
    at the same shapes compile once."""
    return _infer_jit(_jit_key(config), config.max_iter, dist)(data, params, G)
