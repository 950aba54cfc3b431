"""End-to-end multi-device fit on the virtual CPU mesh."""
import numpy as np
import jax
import pytest

import vlgp_tpu
from vlgp_tpu.parallel.driver import fit_sharded
from vlgp_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _trials(seed=0, ntrial=6, length=130, ydim=16, zdim=2):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(zdim, ydim)) * 0.6
    trials, zs = [], []
    for _ in range(ntrial):
        z = np.column_stack(
            (np.sin(np.linspace(0, 7, length)), np.cos(np.linspace(0, 7, length)))
        )
        trials.append({"y": rng.poisson(np.exp(z @ a - 1.6)).astype(float)})
        zs.append(z)
    return trials, np.concatenate(zs)


def _r2(mu, zt):
    X = np.column_stack([mu, np.ones(len(mu))])
    beta, *_ = np.linalg.lstsq(X, zt, rcond=None)
    return 1 - np.sum((X @ beta - zt) ** 2) / np.sum((zt - zt.mean(0)) ** 2)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_fit_sharded_recovers(shape):
    trials, zt = _trials()
    mesh = make_mesh(shape)
    res = fit_sharded(trials, 2, mesh=mesh, dtype="float64", max_iter=8,
                      min_iter=2)
    mu = np.concatenate([t["mu"] for t in res.trials])
    assert _r2(mu, zt) > 0.7
    assert np.isfinite(np.asarray(res.params.a)).all()


# Strict single-vs-multi-device parity runs with hyper_grid=0 and the
# adaptive E/M exits disabled (estep_tol=0, mstep_tol=0): the grid
# stage's argmin is a DISCRETE basin selection, and at a near-tie between
# basins the psum reduction order (which differs between shardings by
# float associativity, ~1e-15) can legitimately flip it — after which the
# EM trajectories stay self-consistently apart (measured: omega 0.00486
# vs 0.00470 on this exact workload).  The continuous golden-section path
# is the well-posed contract for catching real sharding bugs, and the
# adaptive exits' psummed-norm decisions can likewise flip at the
# threshold on reduction-order noise; quality at full defaults is
# covered by test_fit_sharded_recovers.
def test_fit_sharded_matches_single_device():
    trials, zt = _trials(seed=1)
    mesh = make_mesh((8, 1))
    res_m = fit_sharded(trials, 2, mesh=mesh, dtype="float64", max_iter=4,
                        min_iter=1, hyper_grid=0, estep_tol=0, mstep_tol=0)
    res_1 = vlgp_tpu.fit(trials, 2, dtype="float64", max_iter=4, min_iter=1,
                         hyper_grid=0, estep_tol=0, mstep_tol=0)
    # same pipeline, same seeds -> same parameters to solver precision
    assert np.abs(np.asarray(res_m.params.a) - np.asarray(res_1.params.a)).max() < 1e-6
    assert np.abs(np.asarray(res_m.params.omega) - np.asarray(res_1.params.omega)).max() < 1e-8
    mu_m = np.concatenate([t["mu"] for t in res_m.trials])
    mu_1 = np.concatenate([t["mu"] for t in res_1.trials])
    assert np.abs(mu_m - mu_1).max() < 1e-6


def test_fit_sharded_block_matches_single_device_block():
    """VERDICT-r2 item 6: the scanned multi-chip path (k iterations per
    shard_mapped dispatch, one norms sync per block) must match the
    single-device scan driver exactly."""
    trials, _ = _trials(seed=3)
    mesh = make_mesh((4, 2))
    res_m = fit_sharded(trials, 2, mesh=mesh, block=4, dtype="float64",
                        max_iter=8, min_iter=1, hyper_grid=0, estep_tol=0, mstep_tol=0)
    res_1 = vlgp_tpu.fit(trials, 2, block=4, dtype="float64", max_iter=8,
                         min_iter=1, hyper_grid=0, estep_tol=0, mstep_tol=0)
    assert np.abs(np.asarray(res_m.params.a) - np.asarray(res_1.params.a)).max() < 1e-6
    assert np.abs(np.asarray(res_m.params.omega) - np.asarray(res_1.params.omega)).max() < 1e-8
    mu_m = np.concatenate([t["mu"] for t in res_m.trials])
    mu_1 = np.concatenate([t["mu"] for t in res_1.trials])
    assert np.abs(mu_m - mu_1).max() < 1e-6
    assert res_m.runtime["it"] == res_1.runtime["it"]


def test_fit_sharded_pads_odd_channel_count():
    """15 channels on a model axis of 2: padded with an inert channel, and
    the result matches the single-device fit on the same 15 channels."""
    trials, zt = _trials(seed=2, ydim=15)
    mesh = make_mesh((4, 2))
    res_m = fit_sharded(trials, 2, mesh=mesh, dtype="float64", max_iter=4,
                        min_iter=1, hyper_grid=0, estep_tol=0, mstep_tol=0)
    assert res_m.params.ydim == 15
    assert res_m.data.ydim == 15
    res_1 = vlgp_tpu.fit(trials, 2, dtype="float64", max_iter=4, min_iter=1,
                         hyper_grid=0, estep_tol=0, mstep_tol=0)
    assert np.abs(np.asarray(res_m.params.a) - np.asarray(res_1.params.a)).max() < 1e-6
    mu_m = np.concatenate([t["mu"] for t in res_m.trials])
    mu_1 = np.concatenate([t["mu"] for t in res_1.trials])
    assert np.abs(mu_m - mu_1).max() < 1e-6


def test_pad_channels_preserves_likelihood_kind_and_inertness():
    """VERDICT-r3 #3: an all-Poisson model must keep its static
    likelihood_kind="poisson" M-step gating under channel padding, with
    the padded channels pinned EXACTLY inert by params.active."""
    import jax.numpy as jnp
    from vlgp_tpu.config import default_config, make_params
    from vlgp_tpu.data import pack_trials
    from vlgp_tpu.models.vlgp import mstep, update_v, update_w
    from vlgp_tpu.models.gp import make_cholesky
    from vlgp_tpu.parallel.mesh import pad_channels

    trials, _ = _trials(ntrial=3, length=60, ydim=10)
    config = default_config(dtype="float64", mstep_tol=0)
    rng = np.random.default_rng(0)
    params = make_params(10, 2, 1, "poisson",
                         a=rng.normal(size=(2, 10)) * 0.3,
                         b=np.full((1, 10), -1.5), dtype=jnp.float64)
    data = pack_trials(trials, 2, 1, dtype=np.float64)
    G = make_cholesky(data.nbin, params)
    data = update_w(data, params, config)
    data = update_v(data, params, G, config)

    data_p, params_p = pad_channels(data, params, 8)
    assert params_p.likelihood_kind == "poisson"
    assert params_p.active is not None
    assert params_p.a.shape[1] == 16
    assert bool(params_p.poisson.all())

    p1 = mstep(data, params, config)
    p2 = mstep(data_p, params_p, config)
    # real channels bit-identical; padded channels pinned at exactly zero
    assert np.abs(np.asarray(p2.a)[:, :10] - np.asarray(p1.a)).max() == 0
    assert np.abs(np.asarray(p2.b)[:, :10] - np.asarray(p1.b)).max() == 0
    assert np.abs(np.asarray(p2.a)[:, 10:]).max() == 0
    assert np.abs(np.asarray(p2.b)[:, 10:]).max() == 0
    assert np.abs(np.asarray(p2.noise)[10:] - 1.0).max() == 0


def test_fit_sharded_checkpoints_callbacks_initial_params(tmp_path):
    """Mesh-mode mirror of test_api.py::test_fit_path_checkpoints
    (VERDICT-r3 #3): path=... snapshots restorably (with channel padding
    trimmed), callbacks fire per iteration with trimmed params, and the
    result carries initial_params."""
    from vlgp_tpu.utils.io import load_params

    trials, _ = _trials(ntrial=4, length=80, ydim=10)  # 10 % 2 != 0: pads
    mesh = make_mesh((4, 2))
    seen = []

    def recorder(segments, params, config):
        seen.append(np.asarray(params.a).copy())

    ckpt = tmp_path / "snap_sharded"
    res = fit_sharded(trials, 2, mesh=mesh, dtype="float64", max_iter=3,
                      min_iter=3, path=str(ckpt), saving_interval=0.0,
                      callbacks=[recorder])
    assert res.initial_params is not None
    assert res.runtime["it"] == 3
    assert len(seen) == 3
    # callbacks saw TRIMMED params (real channel count, no padding)
    assert seen[0].shape == (2, 10)
    restored = load_params(ckpt.with_suffix(".npz"))
    assert restored.a.shape == (2, 10)
    assert np.abs(np.asarray(restored.a) - np.asarray(res.params.a)).max() == 0


def test_fit_sharded_tracks_elbo():
    """track_elbo on the sharded path records the real-data trajectory at
    iteration boundaries and an EM fit improves it."""
    trials, _ = _trials(ntrial=4, length=80, ydim=10)
    mesh = make_mesh((4, 2))
    res = fit_sharded(trials, 2, mesh=mesh, dtype="float64", max_iter=4,
                      min_iter=1, track_elbo=True)
    e = res.runtime["elbo"]
    assert len(e) == res.runtime["it"]
    assert np.isfinite(e).all()
    assert e[-1] > e[0]


def test_fit_sharded_hyper_interval_matches_single_device():
    """hyper_interval under shard_map: the H-step gate is a lax.cond on
    the replicated iteration index (uniform across devices, so its
    data-axis psums can't deadlock) and must reproduce the single-device
    trajectory exactly — in both per-iteration and block mode."""
    trials, _ = _trials(seed=5)
    kw = dict(dtype="float64", max_iter=4, min_iter=1, hyper_grid=0,
              estep_tol=0, mstep_tol=0, hyper_interval=2, tol=1e-12)
    mesh = make_mesh((4, 2))
    res_m = fit_sharded(trials, 2, mesh=mesh, **kw)
    res_1 = vlgp_tpu.fit(trials, 2, **kw)
    assert np.abs(np.asarray(res_m.params.a) - np.asarray(res_1.params.a)).max() < 1e-6
    assert np.abs(np.asarray(res_m.params.omega) - np.asarray(res_1.params.omega)).max() < 1e-8
    # max_iter=4 exits on it=3, whose H-step was skipped: both paths must
    # have run the closing H-step (ADVICE-r4) to reach the equality above
    assert res_1.runtime.get("final_hstep") is True
    assert res_m.runtime.get("final_hstep") is True
    res_mb = fit_sharded(trials, 2, mesh=mesh, block=2, **kw)
    res_1b = vlgp_tpu.fit(trials, 2, block=2, **kw)
    assert np.abs(np.asarray(res_mb.params.a) - np.asarray(res_1b.params.a)).max() < 1e-6
    assert np.abs(np.asarray(res_mb.params.omega)
                  - np.asarray(res_1b.params.omega)).max() < 1e-8
    assert np.abs(np.asarray(res_1b.params.omega)
                  - np.asarray(res_1.params.omega)).max() < 1e-10
