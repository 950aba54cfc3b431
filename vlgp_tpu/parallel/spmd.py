"""SPMD execution of the EM step over a ('data', 'model') mesh.

Wraps the single-device EM phases (written against :class:`Dist` axis
names) in ``shard_map``: segments are sharded over ``data``, observation
channels over ``model``.  Cross-segment reductions (M-step sufficient
statistics, H-step ELBO sums, convergence norms — the reference's
concatenations at core.py:166-171 and stacks at gp.py:77-78) become
``lax.psum('data')``; cross-channel contractions in the E-step
(``residual @ a`` and the weight refresh, core.py:87/104) become
``lax.psum('model')``.
"""
from __future__ import annotations




import jax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import Config, Params
from ..data import TrialSet
from ..models.driver import make_em_step
from ..models.vlgp import Dist, estep
from .mesh import data_specs, params_specs

__all__ = ["sharded_em_step", "sharded_em_scan", "sharded_infer", "DIST"]

DIST = Dist(data="data", model="model")


def sharded_em_step(mesh: Mesh, config: Config, data: TrialSet, params: Params):
    """Build a jitted, shard_mapped EM step bound to ``mesh``.

    ``data``/``params`` are used only for their pytree structure (static
    fields ride the treedef, so specs are built per-instance).
    Returns a function (data, params, G) -> (data, params, G, norms).
    """
    em = make_em_step(config, DIST, carry_xinv=True)
    dspec = data_specs(data)
    pspec = params_specs(params)
    norm_spec = {k: P() for k in ("mu", "dmu", "a", "da", "b", "db")}
    # the carried Woodbury inverse is (Z, S, R, R): segments over 'data'
    xinv_spec = P(None, "data", None, None)
    fn = shard_map(
        em,
        mesh=mesh,
        in_specs=(dspec, pspec, P(), xinv_spec),
        out_specs=(dspec, pspec, P(), norm_spec, xinv_spec),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_em_scan(mesh: Mesh, config: Config, data: TrialSet,
                    params: Params, k: int):
    """k EM iterations as ONE shard_mapped dispatch (lax.scan over the
    fused step) — the SPMD analog of ``_scan_em_jit`` (models/driver.py).

    On a real multi-host pod every dispatch pays DCN/coordinator latency
    and every norms readback is a cross-host sync; scanning k steps per
    dispatch amortizes both (VERDICT-r2 item 6).  Per-step norms come back
    stacked (k,) so the host still sees every iteration's convergence
    numbers at the block boundary.
    """
    em = make_em_step(config, DIST, carry_xinv=True)
    dspec = data_specs(data)
    pspec = params_specs(params)
    norm_spec = {key: P() for key in ("mu", "dmu", "a", "da", "b", "db")}
    xinv_spec = P(None, "data", None, None)

    def run(data, params, G, xinv):
        def body(carry, _):
            d, p, g, xv = carry
            d, p, g, norms, xv = em(d, p, g, xv)
            return (d, p, g, xv), norms

        (data, params, G, xinv), norms = lax.scan(
            body, (data, params, G, xinv), None, length=k
        )
        return data, params, G, xinv, norms

    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(dspec, pspec, P(), xinv_spec),
        out_specs=(dspec, pspec, P(), xinv_spec, norm_spec),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_infer(mesh: Mesh, config: Config, data: TrialSet, params: Params,
                  niter=None):
    """Shard_mapped inference-only E-step (core.py:260-266 analog)."""
    dspec = data_specs(data)
    pspec = params_specs(params)
    n = config.max_iter if niter is None else niter

    def body(d, p, g):
        return estep(d, p, g, config, niter=n, dist=DIST)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(dspec, pspec, P()),
        out_specs=dspec,
        check_vma=False,
    )
    return jax.jit(fn)
