"""Model selection + evaluation + callbacks + CLI tests."""
import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

import vlgp_tpu
from vlgp_tpu.model_selection import elementwise_error, gmap_speckled_cv, speckled_cv


def _make_trials(ntrial=6, length=100, ydim=12, zdim=2, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(zdim, ydim)) * 0.6
    trials = []
    for _ in range(ntrial):
        z = np.column_stack(
            (np.sin(np.linspace(0, 6, length)), np.cos(np.linspace(0, 6, length)))
        )
        trials.append({"y": rng.poisson(np.exp(z @ a - 1.5)).astype(float)})
    return trials


def test_gmap_speckled_cv_runs_sweep():
    trials = _make_trials()
    tr_err, te_err = gmap_speckled_cv(
        trials, [1, 2], test_ratio=0.15, dt=1.0, var=1.0, scale=10.0,
        max_iter=15, seed=0,
    )
    assert len(tr_err) == 2 and len(te_err) == 2
    assert all(np.isfinite(tr_err)) and all(np.isfinite(te_err))
    # more factors fit the training partition at least as well
    assert tr_err[1] <= tr_err[0] * 1.02


def test_speckled_cv_masks_out_test_entries():
    rng = np.random.default_rng(1)
    import jax

    m, n, ydim, zdim = 8, 40, 6, 2
    t = np.arange(n, dtype=float)
    K = np.exp(-0.5 * ((t[:, None] - t) / 6.0) ** 2) + 1e-6 * np.eye(n)
    y = rng.normal(size=(m, n, ydim))
    C0 = rng.normal(size=(zdim, ydim)) * 0.1
    tr, te = speckled_cv(
        jnp.asarray(y), jnp.asarray(C0), jnp.zeros(ydim), jnp.ones(ydim),
        jnp.asarray(K), 0.2, 5, jax.random.PRNGKey(0),
    )
    assert np.isfinite(tr) and np.isfinite(te)
    # pure-noise data: test error should not be much below training error
    assert te > 0.5 * tr


def test_elementwise_error():
    e = elementwise_error(jnp.asarray([1.0, 2.0]), jnp.asarray([0.0, 4.0]))
    assert np.allclose(np.asarray(e), [1.0, 4.0])


def test_elbo_terms():
    trials = _make_trials(3, 60)
    res = vlgp_tpu.fit(trials, 2, max_iter=2, min_iter=1, dtype="float64")
    terms = vlgp_tpu.evaluation.elbo_terms(res.data, res.params, res.G)
    assert np.isfinite(terms["poisson_ll"])


def test_saver_callback(tmp_path):
    from vlgp_tpu.callback import Saver

    trials = _make_trials(3, 60)
    saver = Saver(tmp_path / "ckpt", saving_interval=0.0)  # save every iter
    vlgp_tpu.fit(trials, 2, max_iter=2, min_iter=1, callbacks=[saver])
    from vlgp_tpu.utils.io import load_params

    p = load_params(tmp_path / "ckpt.npz")
    assert p.a.shape == (2, 12)


def test_timer_context():
    from vlgp_tpu.evaluation import timer
    import time as _time

    with timer() as elapsed:
        _time.sleep(0.01)
        inside = elapsed()
    after = elapsed()
    assert inside >= 0.01
    assert after >= inside


def test_cli_fit_and_transform(tmp_path):
    trials = _make_trials(3, 60)
    y = np.stack([t["y"] for t in trials])
    fin = tmp_path / "in.npz"
    np.savez(fin, y=y)
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "vlgp_tpu", "fit", str(fin), str(out), "2",
         "--max-iter", "2", "--min-iter", "1", "--quiet", "--dtype", "float64"],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "out.npz").exists()
    tout = tmp_path / "mu"
    r2 = subprocess.run(
        [sys.executable, "-m", "vlgp_tpu", "transform", str(fin),
         str(tmp_path / "out.npz"), str(tout)],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    z = np.load(tmp_path / "mu.npz")
    assert z["mu0"].shape == (60, 2)


def test_leave_one_neuron_out_beats_latent_free_baseline():
    from vlgp_tpu.model_selection import leave_one_neuron_out

    trials = _make_trials(ntrial=5, length=120, ydim=12)
    res = vlgp_tpu.fit(trials, 2, dtype="float64", max_iter=8)
    neurons = [0, 3, 7]
    scores = leave_one_neuron_out(res, neurons=neurons)
    assert set(scores) == set(neurons)
    assert all(np.isfinite(v) for v in scores.values())
    # latent-free baseline: predict each neuron from its bias alone
    m = np.asarray(res.data.mask)
    nvalid = m.sum()
    b = np.asarray(res.params.b)
    x = np.asarray(res.data.x)
    y = np.asarray(res.data.y)
    wins = 0
    for n in neurons:
        eta0 = np.einsum("stx,x->st", x[:, :, :, n], b[:, n])
        ll0 = float(((y[:, :, n] * eta0 - np.exp(eta0)) * m).sum() / nvalid)
        wins += scores[n] > ll0
    assert wins >= 2, (scores, wins)
