from .mesh import (
    data_specs,
    make_mesh,
    pad_segments,
    params_specs,
    replicate,
    shard_data,
)
from .spmd import DIST, sharded_em_step, sharded_infer

__all__ = [
    "make_mesh",
    "data_specs",
    "params_specs",
    "shard_data",
    "replicate",
    "pad_segments",
    "sharded_em_step",
    "sharded_infer",
    "DIST",
]
