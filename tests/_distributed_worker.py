"""Subprocess worker for the REAL multi-process distributed test.

Launched by tests/test_parallel.py::test_two_process_distributed_parity as
2 OS processes, each owning 4 virtual CPU devices, joined through a
loopback coordinator (`jax.distributed.initialize` via the env-var path of
`initialize_from_env`). Exercises what the in-process mesh tests cannot:
the coordination-service handshake, `host_local_batch_to_global` with
process_count > 1, and a cross-process all-reduce inside jitted autodiff
(gloo CPU collectives).

Usage: python tests/_distributed_worker.py <out_json>
(coordinator/process env vars are set by the parent:
 JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

# 4 virtual CPU devices per process BEFORE backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

# sitecustomize may already have imported jax and registered a remote
# backend; config.update wins while backend init is still lazy.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from msid_tpu.parallel.distributed import (  # noqa: E402
    host_local_batch_to_global,
    initialize_from_env,
)


def main() -> None:
    out_path = Path(sys.argv[1])
    ok = initialize_from_env()
    result: dict = {"initialized": bool(ok)}
    if not ok:
        out_path.write_text(json.dumps(result))
        raise SystemExit("initialize_from_env fell back to single-process")

    result.update(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))

    # Deterministic global batch; each process feeds only its own half.
    pid, nproc = jax.process_index(), jax.process_count()
    global_batch = np.arange(16 * 4, dtype=np.float32).reshape(16, 4) / 10.0
    targets = np.linspace(-1.0, 1.0, 16, dtype=np.float32)
    per = 16 // nproc
    local = global_batch[pid * per : (pid + 1) * per]
    local_y = targets[pid * per : (pid + 1) * per]

    x = host_local_batch_to_global(local, mesh)
    y = host_local_batch_to_global(local_y, mesh)
    result["global_shape"] = list(x.shape)

    # One SGD step on a replicated weight vector: grad of a mean over the
    # data-sharded batch requires a cross-process all-reduce under jit.
    w0 = jnp.asarray(np.arange(4, dtype=np.float32) / 7.0)
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def step(w, xb, yb):
        def loss(w):
            pred = xb @ w
            return jnp.mean((pred - yb) ** 2)

        val, grad = jax.value_and_grad(loss)(w)
        return val, w - 0.1 * grad

    w0 = jax.device_put(w0, replicated)
    val, w1 = step(w0, x, y)
    result["loss"] = float(val)
    result["w1"] = np.asarray(jax.device_get(w1)).tolist()
    # Addressable mean of the global array (sanity: the batch assembled
    # across processes matches the full matrix).
    result["batch_sum"] = float(jnp.sum(x * x))
    out_path.write_text(json.dumps(result))


if __name__ == "__main__":
    main()
