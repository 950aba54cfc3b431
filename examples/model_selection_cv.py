"""Example: pick the number of latent factors by speckled cross-validation,
then fit vLGP with mixed Poisson + Gaussian channels and ragged trials.

Covers the reference's model_selection + fastfit + mixed-likelihood surface
(SURVEY §2 items 23, 27) in one runnable script.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import vlgp_tpu
from vlgp_tpu.model_selection import gmap_speckled_cv


def main():
    rng = np.random.default_rng(0)
    zdim_true, ydim = 3, 24
    lik = ["poisson"] * 16 + ["gaussian"] * 8
    a = rng.normal(size=(zdim_true, ydim)) * 0.5
    pois = np.array([l == "poisson" for l in lik])

    trials = []
    for L in rng.integers(150, 250, size=8):
        t = np.linspace(0, 8, L)
        z = np.stack([np.sin(t * (k + 1) + rng.uniform(0, 6)) for k in range(zdim_true)], 1)
        eta = z @ a - 1.2
        y = np.where(pois, rng.poisson(np.exp(eta)),
                     eta + rng.normal(size=(L, ydim)) * 0.3)
        trials.append({"y": y.astype(float)})

    print("speckled CV over n_factors (GPFA engine, model_selection.py analog)")
    tr_err, te_err = gmap_speckled_cv(
        trials, [1, 2, 3, 4], test_ratio=0.1, dt=1.0, var=1.0, scale=12.0,
        max_iter=20, seed=0,
    )
    for k, (tr, te) in enumerate(zip(tr_err, te_err), start=1):
        print(f"  n_factors={k}: train={tr:.4f}  test={te:.4f}")
    best = int(np.argmin(te_err)) + 1
    print(f"selected n_factors = {best}")

    result = vlgp_tpu.fit(trials, best, lik=lik, verbose=True)
    print("fitted omega:", np.asarray(result.params.omega))
    print("gaussian channel noise:", np.asarray(result.params.noise)[~pois])
    out = vlgp_tpu.save(result, "/tmp/vlgp_cv_fit")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
