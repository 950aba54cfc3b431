"""End-to-end API tests (model: reference tests/test_api.py, plus actual
recovery assertions the reference lacks)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vlgp_tpu


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    ydim, zdim, length, ntrial = 30, 2, 200, 5
    a = rng.normal(size=(zdim, ydim)) * 0.8
    trials, z_true = [], []
    for i in range(ntrial):
        z = np.column_stack(
            (
                np.sin(np.linspace(0, 8 * np.pi, length)),
                np.cos(np.linspace(0, 8 * np.pi, length)),
            )
        )
        y = rng.poisson(np.exp(z @ a - 2.0)).astype(float)
        trials.append({"y": y, "id": i})
        z_true.append(z)
    return trials, np.concatenate(z_true)


def _r2(mu, zt):
    X = np.column_stack([mu, np.ones(len(mu))])
    beta, *_ = np.linalg.lstsq(X, zt, rcond=None)
    zhat = X @ beta
    return 1 - np.sum((zhat - zt) ** 2) / np.sum((zt - zt.mean(0)) ** 2)


@pytest.fixture(scope="module")
def fitted(data):
    trials, _ = data
    return vlgp_tpu.fit(trials, n_factors=2, dtype="float64", max_iter=10)


def test_fit_recovers_latents(data, fitted):
    _, zt = data
    mu = np.concatenate([t["mu"] for t in fitted.trials])
    assert _r2(mu, zt) > 0.85


def test_result_dict_access(fitted):
    assert fitted["params"] is fitted.params
    assert len(fitted["trials"]) == 5
    with pytest.raises(KeyError):
        fitted["nope"]


def test_transform(data, fitted):
    trials, zt = data
    out = vlgp_tpu.transform([{"y": t["y"]} for t in trials], fitted)
    mu = np.concatenate([t["mu"] for t in out])
    assert _r2(mu, zt) > 0.8
    assert out[0]["mu"].shape == (200, 2)


def test_transform_new_length(fitted, data):
    """New trials with lengths never seen in training must work — the
    reference fails here (core.py:56-58 factor-cache TODO)."""
    trials, _ = data
    short = {"y": trials[0]["y"][:77]}
    out = vlgp_tpu.transform([short], fitted)
    assert out[0]["mu"].shape == (77, 2)
    assert np.isfinite(out[0]["mu"]).all()


def test_sample_posterior(fitted):
    s = vlgp_tpu.sample_posterior(fitted, 0, 7, key=jax.random.PRNGKey(1))
    assert s.shape == (7, 200, 2)
    # samples scatter around the posterior mean
    err = np.abs(np.asarray(s.mean(0)) - np.asarray(fitted.data.mu[0])).max()
    spread = float(jnp.std(s))
    assert np.isfinite(spread) and err < 5 * spread


def test_sample_posterior_raw_trial_params(fitted):
    """Reference call form (api.py:142): a bare trial dict + params —
    no FitResult needed.  Must agree with the FitResult path exactly
    (same key, same state)."""
    k = jax.random.PRNGKey(3)
    trial = {"mu": np.asarray(fitted.data.mu[0]),
             "w": np.asarray(fitted.data.w[0])}
    s_raw = np.asarray(
        vlgp_tpu.sample_posterior(trial, fitted.params, 5, key=k)
    )
    s_fit = np.asarray(vlgp_tpu.sample_posterior(fitted, 0, 5, key=k))
    assert s_raw.shape == (5, 200, 2)
    assert np.abs(s_raw - s_fit).max() < 1e-10


def test_sample_posterior_migrated_reference_result(fitted, tmp_path):
    """A result loaded from a reference-format file (load_reference) can be
    sampled without hand-assembly (VERDICT-r3 missing #3)."""
    # round-trip through the reference's own result schema
    trials = [
        {"ID": i, "y": np.asarray(fitted.data.y[i]),
         "mu": np.asarray(fitted.data.mu[i]),
         "w": np.asarray(fitted.data.w[i]),
         "v": np.asarray(fitted.data.v[i])}
        for i in range(fitted.data.ntrial)
    ]
    rez = {
        "trials": trials,
        "params": {
            "a": np.asarray(fitted.params.a),
            "b": np.asarray(fitted.params.b),
            "noise": np.asarray(fitted.params.noise),
            "sigma": np.asarray(fitted.params.sigma),
            "omega": np.asarray(fitted.params.omega),
            "rank": 50, "gp_noise": 1e-4, "dt": 1.0,
            "zdim": 2, "xdim": 1,
        },
        "config": {},
    }
    np.save(tmp_path / "ref_rez.npy", rez, allow_pickle=True)
    migrated = vlgp_tpu.load_reference(tmp_path / "ref_rez.npy")
    s = vlgp_tpu.sample_posterior(migrated, 0, 4, key=jax.random.PRNGKey(2))
    assert s.shape == (4, 200, 2)
    assert np.isfinite(np.asarray(s)).all()


def test_resume(fitted):
    out = vlgp_tpu.resume(fitted)
    assert np.isfinite(np.asarray(out.params.a)).all()
    assert np.isfinite(np.asarray(out.data.mu)).all()


def test_unequal_lengths_and_mixed_likelihood():
    rng = np.random.default_rng(1)
    ydim, zdim = 12, 2
    lik = ["poisson"] * 8 + ["gaussian"] * 4
    a = rng.normal(size=(zdim, ydim)) * 0.5
    trials = []
    for L in (90, 120, 150):
        z = np.column_stack(
            (np.sin(np.linspace(0, 5, L)), np.cos(np.linspace(0, 5, L)))
        )
        eta = z @ a - 1.0
        pois = np.array([l == "poisson" for l in lik])
        y = np.where(pois, rng.poisson(np.exp(eta)), eta + rng.normal(size=(L, ydim)) * 0.3)
        trials.append({"y": y.astype(float)})
    res = vlgp_tpu.fit(trials, zdim, lik=lik, dtype="float64", max_iter=5, min_iter=1)
    assert np.isfinite(np.asarray(res.params.a)).all()
    out_trials = res.trials
    assert [t["mu"].shape[0] for t in out_trials] == [90, 120, 150]
    # gaussian noise learned positive
    assert (np.asarray(res.params.noise)[8:] > 0).all()


def test_fastfit(data):
    trials, zt = data
    res = vlgp_tpu.fastfit(trials, 2, dt=1.0, var=1.0, scale=20.0, max_iter=10,
                           dtype="float64")
    mu = np.concatenate([t["mu"] for t in res.trials])
    assert _r2(mu, zt) > 0.5


def test_loglik(fitted):
    ll = vlgp_tpu.evaluation.loglik(fitted)
    assert np.isfinite(ll)
    # reference-style dict input path
    ll2 = vlgp_tpu.evaluation.loglik(
        {"trials": fitted.trials, "params": {"a": np.asarray(fitted.params.a),
                                             "b": np.asarray(fitted.params.b)}}
    )
    assert np.isfinite(ll2)
    assert abs(ll - ll2) / abs(ll) < 1e-6


def test_save_load_roundtrip(tmp_path, fitted):
    p = vlgp_tpu.save(fitted, tmp_path / "fit")
    back = vlgp_tpu.load(p)
    assert np.allclose(np.asarray(back.params.a), np.asarray(fitted.params.a))
    assert np.allclose(np.asarray(back.data.mu), np.asarray(fitted.data.mu))
    assert back.config == fitted.config
    # loaded model still usable for transform
    out = vlgp_tpu.transform([{"y": np.asarray(fitted.data.y[0])}], back)
    assert np.isfinite(out[0]["mu"]).all()


def test_unknown_config_rejected(data):
    trials, _ = data
    with pytest.raises(TypeError):
        vlgp_tpu.fit(trials, 2, not_an_option=5)


def test_callbacks_fire(data):
    trials, _ = data
    seen = []
    vlgp_tpu.fit(trials, 2, max_iter=2, min_iter=1,
                 callbacks=[lambda d, p, c: seen.append(1)])
    assert len(seen) == 2


def test_sample_posterior_lowrank_matches_dense(fitted):
    """The O(T r) sampler and the dense Woodbury sampler draw from the same
    distribution: compare per-bin means/stds over many samples."""
    k = jax.random.PRNGKey(3)
    n = 1000
    s_lr = np.asarray(vlgp_tpu.sample_posterior(fitted, 0, n, key=k))
    s_d = np.asarray(vlgp_tpu.sample_posterior(fitted, 0, n, key=k,
                                               method="dense"))
    assert s_lr.shape == s_d.shape
    # same posterior mean.  Both bounds are Monte-Carlo: two INDEPENDENT
    # batches of n draws each — per-element se of a std estimate is
    # sigma/sqrt(2n), the difference of two is sqrt(2) of that, and the
    # max over T*z elements sits ~3.5 sigma out, so the spread bound
    # needs ~3.5*sigma/sqrt(n) of headroom (sigma<~0.9 here).
    assert np.abs(s_lr.mean(0) - s_d.mean(0)).max() < 0.15
    # same marginal spread
    assert np.abs(s_lr.std(0) - s_d.std(0)).max() < 0.12
    # and the marginal std matches the VB variance v
    v = np.sqrt(np.asarray(fitted.data.v[0]))
    assert np.abs(s_lr.std(0) - v).mean() < 0.05


def test_fit_path_checkpoints(data, tmp_path):
    """fit(path=...) snapshots during VEM and leaves a restorable final
    checkpoint without any user-supplied callbacks (the reference README:72
    promise; its own wiring is commented out at api.py:32-37)."""
    from vlgp_tpu.utils.io import load_params

    trials, _ = data
    ckpt = tmp_path / "snap"
    res = vlgp_tpu.fit(trials, 2, max_iter=2, min_iter=1,
                       path=str(ckpt), saving_interval=0.0)
    restored = load_params(ckpt.with_suffix(".npz"))
    assert np.abs(np.asarray(restored.a) - np.asarray(res.params.a)).max() == 0
    assert np.abs(np.asarray(restored.omega) - np.asarray(res.params.omega)).max() == 0


def test_partial_user_mu_fills_missing_trials(data):
    """ADVICE-r1: when only SOME trials carry a user 'mu', the FA init
    must still fill the mu-less trials (per-trial, like the reference's
    preprocess.py:40-41), not be discarded wholesale."""
    from vlgp_tpu.api import _prepare
    from vlgp_tpu.config import default_config

    trials, _ = data
    mixed = [dict(t) for t in trials]
    rng = np.random.default_rng(5)
    user = rng.normal(size=(mixed[0]["y"].shape[0], 2))
    mixed[0]["mu"] = user  # only trial 0 has a user mu
    d, params, fm = _prepare(mixed, 2, default_config())
    # trial 0 keeps the user's values; trial 1 gets the FA transform
    assert np.abs(np.asarray(d.mu[0]) - user).max() < 1e-5
    assert np.abs(np.asarray(d.mu[1])).max() > 1e-6


def test_user_omega_above_bound_fits(data):
    """ADVICE-r1: a user omega above omega_bound[1] must widen the factor
    trim rank (not silently truncate) and fit cleanly."""
    trials, zt = data
    res = vlgp_tpu.fit(trials, 2, omega=np.full(2, 0.2), Hstep=False,
                       max_iter=3, min_iter=1)
    mu = np.concatenate([t["mu"] for t in res.trials])
    assert np.isfinite(mu).all()
