#!/usr/bin/env python
"""Full-scene restoration CLI (`msid-restore`).

Denoises an arbitrary-size multispectral scene with the sliding-window
pipeline (`msid_tpu/deployment/sliding_window.py`): overlapping windows,
Hann-blended seams, device-resident assembly; large scenes stream as row
bands so upload/compute/download overlap through the relay.

New user surface beyond the reference (which only handles 64x64 tiles —
BASELINE.json configs[4] is the scene target); checkpoint loading and
config semantics mirror scripts/evaluate.py.

Examples:
    msid-restore --config configs/base.yaml --checkpoint runs/ckpts \
        --input scene.tif --output restored.tif
    msid-restore ... --input scene.npy --output restored.npy \
        --tta 4 --reflectance --streaming
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Streaming pays off once the whole-scene H2D/D2H transfers dominate;
# ~16 Mpix (e.g. 4096x4096) is where banding starts winning on the relay.
AUTO_STREAM_PIXELS = 16e6


def parse_args():
    p = argparse.ArgumentParser(description="Restore a full scene (TPU)")
    p.add_argument("--config", type=str, default="configs/base.yaml")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="checkpoint directory (Orbax manager root)")
    p.add_argument("--input", type=str, required=True,
                   help="scene: .tif/.tiff (built-in reader) or .npy [H,W,C]")
    p.add_argument("--output", type=str, required=True,
                   help="restored scene: .tif/.tiff or .npy")
    p.add_argument("--window", type=int, default=64,
                   help="native-resolution window size (training tile size)")
    p.add_argument("--overlap", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--tta", type=int, nargs="?", const=8, default=1,
                   metavar="N", help="dihedral self-ensemble (1-8)")
    p.add_argument("--streaming", choices=("auto", "on", "off"),
                   default="auto",
                   help="banded H2D/compute/D2H overlap (auto: scenes "
                        ">16 Mpix)")
    p.add_argument("--reflectance", action="store_true",
                   help="write [0,1] reflectance instead of model range")
    p.add_argument("--output-dtype", choices=("float32", "float16"),
                   default="float32")
    p.add_argument("--raw-weights", action="store_true",
                   help="use live params even when the checkpoint carries "
                        "an EMA shadow")
    p.add_argument("--device", type=str, default=None,
                   help="jax platform override (tpu/cpu)")
    return p.parse_args()


def load_scene(path: str):
    import numpy as np

    p = Path(path)
    if p.suffix.lower() in (".tif", ".tiff"):
        from msid_tpu.data.tiff import read_tiff

        scene = read_tiff(p)
    elif p.suffix.lower() == ".npy":
        scene = np.load(p)
    else:
        raise SystemExit(f"unsupported input format {p.suffix!r} "
                         "(use .tif/.tiff/.npy)")
    if scene.ndim == 2:
        scene = scene[:, :, None]
    if scene.ndim != 3:
        raise SystemExit(f"expected [H,W,C] scene, got shape {scene.shape}")
    return scene


def save_scene(path: str, scene):
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    if p.suffix.lower() in (".tif", ".tiff"):
        from msid_tpu.data.tiff import write_tiff

        write_tiff(p, scene)
    elif p.suffix.lower() == ".npy":
        import numpy as np

        np.save(p, scene)
    else:
        raise SystemExit(f"unsupported output format {p.suffix!r}")


def main():
    args = parse_args()
    if args.device:
        import os

        os.environ["JAX_PLATFORMS"] = args.device
        import jax as _jax

        _jax.config.update("jax_platforms", args.device)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s: %(message)s")
    logger = logging.getLogger("restore")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msid_tpu.models import SatMAERestoration, init_model
    from msid_tpu.ops.tta import orbit_prefix
    from msid_tpu.utils.checkpointing import CheckpointManager
    from msid_tpu.utils.config import coerce_scheduler_params, load_config

    config = coerce_scheduler_params(load_config(args.config))
    config["model"]["encoder"]["pretrained_path"] = None
    image_size = int(config["data"].get("image_size", 192))
    orbit_prefix(args.tta, image_size, image_size)  # fail fast on bad --tta

    scene = load_scene(args.input)
    logger.info("Scene %s: %s %s", args.input, scene.shape, scene.dtype)
    want_bands = int(config["model"]["encoder"].get("input_channels", 13))
    if scene.shape[2] != want_bands:
        raise SystemExit(
            f"scene has {scene.shape[2]} bands but the model expects "
            f"{want_bands} (model.encoder.input_channels)")

    compute_dtype = (
        jnp.bfloat16 if config.get("training", {}).get("mixed_precision", True)
        else jnp.float32
    )
    model = SatMAERestoration.from_config(config, dtype=compute_dtype)
    variables = init_model(model, jax.random.PRNGKey(int(config.get("seed", 42))))

    from msid_tpu.training import TrainState, build_optimizer_from_config

    tx, _ = build_optimizer_from_config(config, variables["params"])
    target = TrainState.create(variables, tx)
    mgr = CheckpointManager(args.checkpoint)
    out = mgr.load_best(target=target) or mgr.load_latest(target=target)
    if out is None:
        raise FileNotFoundError(f"No checkpoint found under {args.checkpoint}")
    state, _, step = out
    variables = state.variables if args.raw_weights else state.eval_variables
    logger.info("Restored checkpoint step %d from %s", step, args.checkpoint)

    from msid_tpu.deployment.sliding_window import (
        restore_scene,
        restore_scene_streaming,
    )

    h, w = scene.shape[:2]
    stream = (args.streaming == "on"
              or (args.streaming == "auto" and h * w > AUTO_STREAM_PIXELS))
    out_dtype = np.dtype(args.output_dtype)
    kwargs = dict(window=args.window, overlap=args.overlap,
                  model_size=image_size, batch_size=args.batch_size,
                  tta=args.tta, output_dtype=out_dtype)
    t0 = time.perf_counter()
    if stream:
        logger.info("Streaming restore (banded H2D/compute/D2H overlap)")
        restored = restore_scene_streaming(model, variables, scene, **kwargs)
    else:
        restored = restore_scene(model, variables, scene,
                                 device_assembly=True, **kwargs)
    dt = time.perf_counter() - t0
    logger.info("Restored %.1f Mpix in %.1f s (%.3f Mpix/s)",
                h * w / 1e6, dt, h * w / 1e6 / dt)

    if args.reflectance:
        # Host-side numpy mirror of ops.preprocess.from_model_range: a full
        # scene can be GBs, and routing it back through the device for a
        # trivial affine would double the relay traffic (and can exceed HBM
        # on 10980^2x13 scenes).
        restored = np.clip(
            restored.astype(np.float32) * 0.25 + 0.5, 0.0, 1.0
        ).astype(out_dtype)
    save_scene(args.output, restored)
    logger.info("Wrote %s (%s, %s)", args.output, restored.shape,
                restored.dtype)


if __name__ == "__main__":
    main()
