"""Reference-format migration (VERDICT-r2 missing #1).

A user coming from the reference implementation has result/trials files
written by ``vlgp.util.save`` (pickle-via-np.save, util.py:181-208); this
suite writes such files with the *actual reference code* and loads them
through ``vlgp_tpu.load`` / the CLI.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import vlgp_tpu
from refshim import load_reference

REPO = Path(__file__).resolve().parent.parent

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")


def _reference_result(ntrial=3, length=60, ydim=6, zdim=2):
    """A small reference-style fitted result dict, via the reference's own
    config/params builders (no full reference fit needed)."""
    from vlgp.preprocess import fill_params, fill_trials, get_config, get_params

    rng = np.random.default_rng(0)
    a = rng.normal(size=(zdim, ydim)) * 0.5
    trials = []
    for i in range(ntrial):
        z = np.column_stack(
            (np.sin(np.linspace(0, 6, length)), np.cos(np.linspace(0, 6, length)))
        )
        y = rng.poisson(np.exp(z @ a - 1.5)).astype(float)
        trials.append(
            {"ID": i, "y": y, "mu": z + rng.normal(size=z.shape) * 0.1,
             "x": np.ones((length, 1, ydim))}
        )
    config = get_config(max_iter=7, window=30)
    params = get_params(trials, zdim, omega_bound=config["omega_bound"])
    params["a"] = a
    params["b"] = np.full((1, ydim), -1.5)
    fill_params(params)
    fill_trials(trials)
    return {"trials": trials, "params": params, "config": config}


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    from vlgp.util import save

    rez = _reference_result()
    d = tmp_path_factory.mktemp("refio")
    save(rez, d / "result", ext="npy")
    save(rez, d / "result_z", ext="npz")
    return rez, d


def _check_result(rez, res):
    assert isinstance(res, vlgp_tpu.FitResult)
    np.testing.assert_allclose(np.asarray(res.params.a), rez["params"]["a"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.params.omega),
                               rez["params"]["omega"], rtol=1e-6)
    assert res.params.rank == rez["params"]["rank"]
    assert res.config.max_iter == rez["config"]["max_iter"]
    assert res.config.window == rez["config"]["window"]
    assert res.data.ntrial == len(rez["trials"])
    np.testing.assert_allclose(
        np.asarray(res.data.mu[0]), rez["trials"][0]["mu"], rtol=1e-5, atol=1e-6
    )
    # the loaded result must be usable: posterior state round-trips and
    # transform runs under the migrated params
    out = vlgp_tpu.transform([{"y": t["y"]} for t in rez["trials"]], res)
    assert np.isfinite(out[0]["mu"]).all()


def test_load_reference_npy(saved):
    rez, d = saved
    _check_result(rez, vlgp_tpu.load(d / "result.npy"))


def test_load_reference_npz(saved):
    rez, d = saved
    _check_result(rez, vlgp_tpu.load(d / "result_z.npz"))


def test_load_reference_trials(saved, tmp_path):
    from vlgp.util import save

    rez, _ = saved
    save(np.asarray(rez["trials"], dtype=object), tmp_path / "trials",
         ext="npy")
    trials = vlgp_tpu.load_reference_trials(tmp_path / "trials.npy")
    assert len(trials) == len(rez["trials"])
    np.testing.assert_array_equal(trials[0]["y"], rez["trials"][0]["y"])


def test_cli_accepts_reference_trials(saved, tmp_path):
    from vlgp.util import save

    rez, _ = saved
    save(np.asarray(rez["trials"], dtype=object), tmp_path / "trials",
         ext="npy")
    out = tmp_path / "fit_out"
    proc = subprocess.run(
        [sys.executable, "-m", "vlgp_tpu", "fit", str(tmp_path / "trials.npy"),
         str(out), "2", "--max-iter", "2", "--min-iter", "1", "--quiet"],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.with_suffix(".npz").exists()
