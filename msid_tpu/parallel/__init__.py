"""Parallelism layer: mesh construction, shardings, distributed init."""

from msid_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    make_mesh,
    make_mesh_from_config,
    pad_batch_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
from msid_tpu.parallel.tp import (
    describe_sharding,
    shard_train_state,
    spec_for_path,
)

__all__ = [
    "describe_sharding",
    "shard_train_state",
    "spec_for_path",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharded",
    "make_mesh",
    "make_mesh_from_config",
    "pad_batch_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
]
