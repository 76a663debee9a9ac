#!/usr/bin/env python
"""Controlled study of the round-4 scene-restoration throughput drop
(VERDICT r4 weak #2): committed round-3 numbers were 0.90 Mpix/s
streaming / 0.537 device-assembly at 2560 px; the round-4 refresh saw
0.586 / 0.188 on the SAME code path and the SAME default architecture
(the bench model is `SatMAERestoration()` — unet_light, no fill — in
both rounds, so "the flagship arch costs more per tile" cannot explain
it).

Hypothesis under test: the 2026-08-20 machine reset changed the axon
relay's effective transfer bandwidth/latency, which scene restoration
(one 170 MB upload + one download at 2560²×13) is uniquely exposed to
while the compute-bound rows (train step, b=1 latency) are not.

Rows measured (3 repeats each, value-fetch barriers):
  * raw H2D: jnp.asarray(uint16 scene) + barrier
  * raw D2H: jax.device_get of an fp16 scene-sized device array
  * dispatch floor: 300-iteration pipelined trivial jit
  * restore_scene device_assembly, default arch
  * restore_scene_streaming, default arch
  * both again on the flagship arch (unet_skip + fill + residual,
    random weights — perf only) to price the model delta separately

Writes benchmarks/results/scene_study_r5.json (committed evidence).
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msid_tpu.deployment.sliding_window import (
        make_device_scene_step,
        restore_scene,
        restore_scene_streaming,
    )
    from msid_tpu.models import SatMAERestoration, init_model

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    reps = 3
    rng = np.random.default_rng(0)
    scene = rng.uniform(0, 10000, (side, side, 13)).astype(np.uint16)
    mpix = side * side / 1e6
    mbytes = scene.nbytes / 1e6
    out = {"device": str(jax.devices()[0]), "side_px": side,
           "scene_mbytes": round(mbytes, 1)}

    # -- raw transfer rows -------------------------------------------------
    h2d = []
    for _ in range(reps):
        t0 = time.perf_counter()
        dev = jnp.asarray(scene)
        float(jnp.sum(dev[0, 0]))  # barrier (block_until_ready lies on relay)
        h2d.append(time.perf_counter() - t0)
        del dev
    out["h2d_mb_per_s"] = [round(mbytes / t, 1) for t in h2d]

    dev16 = jnp.zeros((side, side, 13), jnp.float16)
    float(jnp.sum(dev16[0, 0]))
    d2h = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(dev16)
        d2h.append(time.perf_counter() - t0)
    out["d2h_mb_per_s"] = [round(dev16.nbytes / 1e6 / t, 1) for t in d2h]
    del dev16

    trivial = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(trivial(x)))
    t0 = time.perf_counter()
    y = x
    for _ in range(300):
        y = trivial(y)
    float(jnp.sum(y))
    out["dispatch_floor_ms"] = round((time.perf_counter() - t0) / 300 * 1e3, 3)

    # -- scene restoration, both arches ------------------------------------
    def bench_arch(tag, model):
        variables = init_model(model, jax.random.PRNGKey(0))
        step = make_device_scene_step(model, variables, window=64,
                                      model_size=192, overlap=16)
        # warm at the benched shape (the jit specializes on scene shape)
        restore_scene(model, variables, scene, window=64, overlap=16,
                      model_size=192, batch_size=64, device_assembly=True,
                      step=step)
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            restore_scene(model, variables, scene, window=64, overlap=16,
                          model_size=192, batch_size=64,
                          device_assembly=True, step=step)
            dts.append(time.perf_counter() - t0)
        out[f"{tag}_device_assembly_mpix_per_s"] = [
            round(mpix / t, 3) for t in dts]

        restore_scene_streaming(model, variables, scene, window=64,
                                overlap=16, model_size=192, batch_size=64,
                                step=step)
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            restore_scene_streaming(model, variables, scene, window=64,
                                    overlap=16, model_size=192,
                                    batch_size=64, step=step)
            dts.append(time.perf_counter() - t0)
        out[f"{tag}_streaming_mpix_per_s"] = [round(mpix / t, 3) for t in dts]
        print(json.dumps({k: v for k, v in out.items() if k.startswith(tag)}))

    bench_arch("default", SatMAERestoration(dtype=jnp.bfloat16,
                                            gradient_checkpointing=False))
    bench_arch("flagship", SatMAERestoration(
        dtype=jnp.bfloat16, gradient_checkpointing=False,
        decoder_arch="unet_skip", residual_output=True, input_fill=True))

    for k in ("default_streaming_mpix_per_s", "flagship_streaming_mpix_per_s"):
        out[k + "_mean"] = round(statistics.fmean(out[k]), 3)
    out["reference_rows"] = {
        "r3_streaming": 0.90, "r3_device_assembly": 0.537,
        "r4_streaming": 0.586, "r4_device_assembly": 0.188,
    }
    dest = Path(__file__).parent / "results" / "scene_study_r5.json"
    dest.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
