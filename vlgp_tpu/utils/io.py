"""Persistence: save/load results and parameters.

Reference: ``util.save/load`` (util.py:181-208) pickle-via-npy of the whole
result dict.  Here results serialize to a flat ``.npz`` of arrays plus a
small JSON header (portable, no pickle execution risk), with an optional
orbax checkpoint path for training-time snapshots.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import Config, Params
from ..data import TrialSet
from ..init import FactorModel

__all__ = ["save", "load", "save_params", "load_params"]

_TRIAL_FIELDS = ("y", "x", "mask", "mu", "w", "v", "dmu", "trial_idx", "start", "lengths")
_PARAM_FIELDS = ("a", "b", "noise", "sigma", "omega", "poisson", "da", "db")
_FM_FIELDS = ("mean", "a", "psi")


def save(result, path) -> pathlib.Path:
    """Save a :class:`~vlgp_tpu.api.FitResult` to ``<path>.npz``."""
    path = pathlib.Path(path).with_suffix(".npz")
    arrays = {}
    for f in _TRIAL_FIELDS:
        arrays[f"data.{f}"] = np.asarray(getattr(result.data, f))
    for f in _PARAM_FIELDS:
        arrays[f"params.{f}"] = np.asarray(getattr(result.params, f))
    if result.factor_model is not None:
        for f in _FM_FIELDS:
            arrays[f"fm.{f}"] = np.asarray(getattr(result.factor_model, f))
    arrays["G"] = np.asarray(result.G)
    header = {
        "config": dataclasses.asdict(result.config),
        "scalars": {
            "gp_noise": result.params.gp_noise,
            "dt": result.params.dt,
            "rank": result.params.rank,
        },
        "runtime": result.runtime,
    }
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez(path, **arrays)
    return path


def load(path):
    """Load a result saved by :func:`save` back into a FitResult."""
    from ..api import FitResult  # local import to avoid a cycle

    path = pathlib.Path(path)
    if not path.exists():
        raise FileNotFoundError(str(path))
    z = np.load(path)
    header = json.loads(bytes(z["header"].tobytes()).decode())
    cfg = header["config"]
    if isinstance(cfg.get("omega_bound"), list):
        cfg["omega_bound"] = tuple(cfg["omega_bound"])
    config = Config(**cfg)
    data = TrialSet(**{f: jnp.asarray(z[f"data.{f}"]) for f in _TRIAL_FIELDS})
    params = Params(
        **{f: jnp.asarray(z[f"params.{f}"]) for f in _PARAM_FIELDS},
        **header["scalars"],
    )
    fm = None
    if "fm.mean" in z:
        fm = FactorModel(**{f: jnp.asarray(z[f"fm.{f}"]) for f in _FM_FIELDS})
    return FitResult(
        data=data,
        params=params,
        config=config,
        factor_model=fm,
        G=jnp.asarray(z["G"]),
        runtime=header.get("runtime", {}),
    )


def save_params(params: Params, path) -> pathlib.Path:
    path = pathlib.Path(path).with_suffix(".npz")
    arrays = {f: np.asarray(getattr(params, f)) for f in _PARAM_FIELDS}
    arrays["_scalars"] = np.frombuffer(
        json.dumps(
            {"gp_noise": params.gp_noise, "dt": params.dt, "rank": params.rank}
        ).encode(),
        dtype=np.uint8,
    )
    np.savez(path, **arrays)
    return path


def load_params(path) -> Params:
    z = np.load(pathlib.Path(path))
    scalars = json.loads(bytes(z["_scalars"].tobytes()).decode())
    return Params(**{f: jnp.asarray(z[f]) for f in _PARAM_FIELDS}, **scalars)


def save_checkpoint(path, params: Params, data: Optional[TrialSet] = None,
                    step: int = 0):
    """Orbax checkpoint of params (and optionally posterior state).

    Training-time alternative to the npz snapshot — async-friendly,
    multi-host-safe.  Restore with :func:`restore_checkpoint`.
    """
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        tree = {"params": params}
        if data is not None:
            tree["posterior"] = {"mu": data.mu, "w": data.w, "v": data.v}
        ckptr.save(path / f"step_{step}", tree, force=True)
    return path / f"step_{step}"


def restore_checkpoint(path, params_like: Params,
                       data_like: Optional[TrialSet] = None):
    """Restore an orbax checkpoint saved by :func:`save_checkpoint`.

    ``params_like``/``data_like`` provide the pytree structure/shapes.
    Returns (params, posterior_dict_or_None).
    """
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        target = {"params": params_like}
        if data_like is not None:
            target["posterior"] = {
                "mu": data_like.mu, "w": data_like.w, "v": data_like.v
            }
        out = ckptr.restore(path, target)
    return out["params"], out.get("posterior")
