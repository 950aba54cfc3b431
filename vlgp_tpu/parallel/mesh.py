"""Device mesh construction and sharding specs.

The reference has no parallelism at all (SURVEY §2: single-process loops;
an unused ``parallel: False`` flag at preprocess.py:105).  The TPU build's
communication backend is a 2-D ``jax.sharding.Mesh``:

  * ``data``  — segments/trials (the E-step is embarrassingly parallel per
    segment; M/H-step sufficient statistics are psummed over this axis);
  * ``model`` — observation channels (per-neuron M-step updates are local;
    the E-step's channel contractions psum over this axis).

Collectives ride ICI via ``lax.psum`` inside ``shard_map``; no NCCL/MPI
analog exists in the reference to port.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Params
from ..data import TrialSet

__all__ = [
    "make_mesh",
    "data_specs",
    "params_specs",
    "shard_data",
    "replicate",
    "pad_segments",
]


def make_mesh(
    shape: Optional[Tuple[int, int]] = None, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Default: all devices on the data axis (channel counts are usually much
    smaller than segment counts).
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "model"))


def data_specs(data: TrialSet) -> TrialSet:
    """PartitionSpec pytree for a TrialSet: segments over 'data', channels
    over 'model'."""
    return data.replace(
        y=P("data", None, "model"),
        x=P("data", None, None, "model"),
        mask=P("data", None),
        mu=P("data", None, None),
        w=P("data", None, None),
        v=P("data", None, None),
        dmu=P("data", None, None),
        trial_idx=P("data"),
        start=P("data"),
        lengths=P("data"),
    )


def params_specs(params: Params) -> Params:
    """PartitionSpec pytree for Params: channel-indexed arrays over
    'model', latent-indexed arrays replicated."""
    return params.replace(
        a=P(None, "model"),
        b=P(None, "model"),
        noise=P("model"),
        sigma=P(),
        omega=P(),
        poisson=P("model"),
        da=P(None, "model"),
        db=P(None, "model"),
    )


def shard_data(data: TrialSet, mesh: Mesh) -> TrialSet:
    """Place a TrialSet onto the mesh with the canonical shardings."""
    specs = data_specs(data)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), data, specs
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def pad_segments(data: TrialSet, multiple: int) -> TrialSet:
    """Pad the segment axis with fully-masked rows to a multiple of the
    data-axis mesh size (masked rows contribute nothing to any reduction)."""
    n = data.ntrial
    target = -(-n // multiple) * multiple
    if target == n:
        return data
    pad = target - n

    def padrow(x):
        pads = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pads)

    return jax.tree.map(lambda x: jax.numpy.asarray(padrow(x)), data)
