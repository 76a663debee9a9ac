"""Device-mesh construction and sharding helpers.

The reference has **no distributed backend at all** (SURVEY §5.8 — one
process, one GPU, no NCCL/MPI). This module is the additive TPU-native
scaling layer: a data-parallel `jax.sharding.Mesh` with the batch axis
sharded across chips, parameters replicated, gradient all-reduce emitted
by XLA over ICI. Multi-host entry via `jax.distributed.initialize` +
host-local sharded feeding.

Scaling recipe (jax-ml.github.io/scaling-book): pick the mesh, annotate
shardings at the jit boundary, let GSPMD place collectives, profile.
For this model (86M params, batch-dominant compute) pure DP over ICI is
the right first-order layout; the mesh builder also supports a secondary
``model`` axis for future tensor sharding of the ViT MLPs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: int = -1,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data[, model]) mesh over the visible devices.

    Args:
        num_devices: total devices to use; -1 = all visible.
        data_parallel: explicit DP degree (default = num_devices // model_parallel).
        model_parallel: secondary axis size (1 = pure DP).
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devs = devs[:num_devices]
    n = len(devs)
    if model_parallel <= 1:
        if data_parallel is not None:  # honor an explicit DP degree
            assert 0 < data_parallel <= n, (
                f"data_parallel={data_parallel} exceeds {n} devices"
            )
            devs = devs[:data_parallel]
        return Mesh(np.array(devs), (DATA_AXIS,))
    dp = data_parallel or n // model_parallel
    assert dp * model_parallel == n, (
        f"{dp}x{model_parallel} mesh does not cover {n} devices"
    )
    return Mesh(np.array(devs).reshape(dp, model_parallel), (DATA_AXIS, MODEL_AXIS))


def make_mesh_from_config(config: dict) -> Mesh:
    par = config.get("parallel", {})
    return make_mesh(
        num_devices=int(par.get("num_devices", -1)),
        model_parallel=int(par.get("model_parallel", 1)),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    return jax.device_put(batch, batch_sharded(mesh, axis))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) onto every device in the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_multiple(batch: np.ndarray, multiple: int) -> tuple:
    """Pad the leading axis to a multiple (for sharding); returns
    (padded, true_count)."""
    n = batch.shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[:1], multiple - rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n
