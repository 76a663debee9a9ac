"""Multi-host (multi-process) entry points.

The reference is strictly single-process (SURVEY §5.8). For TPU pods,
JAX's runtime handles cross-host collectives once processes are
initialized; this module wraps `jax.distributed.initialize` with
environment-driven defaults and provides host-local batch placement for
data loading (each host feeds its own shard of the global batch).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-process JAX from args or env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on
    Cloud TPU pods plain `jax.distributed.initialize()` auto-discovers).

    Returns True if distributed mode was initialized, False for the
    single-process fallback. Safe to call unconditionally.
    """
    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 0) or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", -1)
    )

    try:
        if coordinator and nproc:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=nproc,
                process_id=pid if pid >= 0 else None,
            )
        elif os.environ.get("TPU_WORKER_HOSTNAMES") and nproc:
            jax.distributed.initialize()
        else:
            return False
    except Exception as e:  # noqa: BLE001 — single-process fallback
        logger.warning("jax.distributed.initialize failed (%s) — single process", e)
        return False
    logger.info(
        "distributed: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def host_local_batch_to_global(batch: np.ndarray, mesh, data_axis: str = "data"):
    """Assemble a host-local batch shard into a global sharded array.

    Each process feeds ``global_batch / process_count`` samples; the result
    behaves like the full batch sharded over ``data_axis``
    (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(data_axis))
    global_shape = (batch.shape[0] * jax.process_count(), *batch.shape[1:])
    return jax.make_array_from_process_local_data(sharding, batch, global_shape)
