"""Multi-device vLGP: fit over a ('data', 'model') mesh.

Runs on real multi-chip hardware as-is; for a laptop/CI demo it creates 8
virtual CPU devices (the TPU-native analog of a fake backend — see
SURVEY.md §4).

Run: python examples/multichip.py [--data 4 --model 2]
"""
import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=int, default=4, help="data-parallel axis size")
    p.add_argument("--model", type=int, default=2, help="channel-parallel axis size")
    p.add_argument("--virtual-cpu", action="store_true", default=None,
                   help="force an 8-device virtual CPU mesh")
    args = p.parse_args()

    n_needed = args.data * args.model
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(8, n_needed)}"
        ).strip()

    import jax

    # Decide the platform BEFORE any device query if virtual CPU was asked
    # for (a backend, once initialized, can't be switched away from);
    # otherwise probe the real devices and fall back to the virtual CPU
    # mesh when the host has too few chips.
    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
        devs = jax.devices("cpu")
    else:
        devs = jax.devices()
        if len(devs) < n_needed:
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass  # already initialized; explicit cpu devices below
            devs = jax.devices("cpu")
    if len(devs) < n_needed:
        raise SystemExit(f"need {n_needed} devices, have {len(devs)}")

    import numpy as np

    from vlgp_tpu.parallel.driver import fit_sharded
    from vlgp_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    zdim, ydim = 2, 16  # ydim must divide the model axis
    a = rng.normal(size=(zdim, ydim)) * 0.6
    trials, zs = [], []
    for _ in range(8):
        z = np.column_stack(
            (np.sin(np.linspace(0, 7, 150)), np.cos(np.linspace(0, 7, 150)))
        )
        trials.append({"y": rng.poisson(np.exp(z @ a - 1.5)).astype(float)})
        zs.append(z)

    mesh = make_mesh((args.data, args.model), devices=devs[:n_needed])
    print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    with jax.default_device(devs[0]):  # keep setup ops on the mesh platform
        result = fit_sharded(trials, zdim, mesh=mesh, verbose=True, max_iter=8)

    mu = np.concatenate([t["mu"] for t in result.trials])
    zt = np.concatenate(zs)
    X = np.column_stack([mu, np.ones(len(mu))])
    beta, *_ = np.linalg.lstsq(X, zt, rcond=None)
    r2 = 1 - ((X @ beta - zt) ** 2).sum() / ((zt - zt.mean(0)) ** 2).sum()
    print(f"latent recovery R^2 = {r2:.3f}")
    print(f"omega = {np.asarray(result.params.omega)}")


if __name__ == "__main__":
    main()
