"""One-call session bootstrap helpers (notebook / embedding API).

Capability parity with the reference `src/utils/setup_helpers.py:17-338`:
config path resolution + type coercion, device selection, model
construction with a memory estimate, training-component assembly, and a
single `setup_training_session` that returns everything `Trainer.fit`
needs. The reference's VRAM probe becomes an analytic HBM estimate plus
`jax.local_devices()[0].memory_stats()` when available.
"""

from __future__ import annotations

import copy
import logging
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)


def setup_config(config_path: str | Path) -> dict:
    """Load + validate + coerce a config (reference setup_helpers.py:17-67)."""
    from msid_tpu.utils.config import (
        coerce_scheduler_params,
        load_config,
        validate_config,
    )

    config = coerce_scheduler_params(load_config(config_path))
    validate_config(config)
    return config


def setup_device(platform: Optional[str] = None):
    """Select the jax platform ('tpu'/'cpu'); returns the device list.

    NB: must run before any backend initialization. config.update is used
    rather than JAX_PLATFORMS because the interpreter may have imported
    jax already (reference setup_helpers.py:70-100 picked cuda/cpu)."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    devices = jax.devices()
    logger.info("platform=%s devices=%d", jax.default_backend(), len(devices))
    return devices


def create_model_from_config(config: dict, seed: int = 0):
    """Model + initialized variables + parameter/memory report
    (reference setup_helpers.py:103-147)."""
    import jax
    import jax.numpy as jnp

    from msid_tpu.models import SatMAERestoration, count_parameters, init_model

    compute_dtype = (
        jnp.bfloat16
        if config.get("training", {}).get("mixed_precision", True)
        else jnp.float32
    )
    model = SatMAERestoration.from_config(config, dtype=compute_dtype)
    variables = init_model(model, jax.random.PRNGKey(seed))
    counts = count_parameters(variables)
    mem = estimate_memory(config, counts["total"])
    logger.info(
        "model: encoder=%.1fM decoder=%.1fM total=%.1fM params, est. HBM %.2f GB",
        counts["encoder"] / 1e6, counts["decoder"] / 1e6, counts["total"] / 1e6,
        mem["total_gb"],
    )
    return model, variables, counts


def estimate_memory(config: dict, num_params: int) -> dict:
    """Analytic training-memory estimate (reference profile_memory,
    satmae_restoration.py:244-313: weights + optimizer + grads +
    activations). fp32 params + 2x adamw moments + fp32 grads; activations
    from micro-batch geometry with remat (only block boundaries saved)."""
    training = config.get("training", {})
    data = config.get("data", {})
    micro = int(training.get("micro_batch_size", 8))
    size = int(data.get("image_size", 192))
    bands = int(data.get("num_bands", 13))
    enc = config.get("model", {}).get("encoder", {})
    depth = int(enc.get("depth", 12))
    dim = int(enc.get("embed_dim", 768))
    patch = int(enc.get("patch_size", 16))
    tokens = (size // patch) ** 2

    params_gb = num_params * 4 / 1e9
    optimizer_gb = num_params * 8 / 1e9  # adamw m+v fp32
    grads_gb = num_params * 4 / 1e9
    # remat: keep one activation per block boundary (+input/output images)
    acts = micro * (depth + 2) * tokens * dim * 2  # bf16
    acts += micro * size * size * bands * 4 * 4  # images in/out, fp32 x few
    activations_gb = acts / 1e9
    total = params_gb + optimizer_gb + grads_gb + activations_gb
    return {
        "params_gb": params_gb,
        "optimizer_gb": optimizer_gb,
        "grads_gb": grads_gb,
        "activations_gb": activations_gb,
        "total_gb": total,
    }


def device_memory_stats() -> dict:
    """Live per-device memory from the runtime, when the backend exposes it
    (the reference's get_memory_stats, trainer.py:496-510)."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


def create_training_components(config: dict, variables: dict, steps_per_epoch: int = 1):
    """optax chain + schedule + loss/noise configs
    (reference setup_helpers.py:150-199)."""
    from msid_tpu.ops.noise import NoiseConfig
    from msid_tpu.training.losses import LossConfig
    from msid_tpu.training.optim import build_optimizer_from_config

    tx, schedule = build_optimizer_from_config(
        config, variables["params"], steps_per_epoch=steps_per_epoch
    )
    return tx, schedule, LossConfig.from_config(config), NoiseConfig.from_config(config)


def setup_training_session(
    config_path: str | Path | dict,
    output_dir: str | Path = "outputs",
    seed: Optional[int] = None,
    platform: Optional[str] = None,
    epochs: Optional[int] = None,
    synthetic: bool = False,
):
    """Everything `Trainer.fit` needs, in one call
    (reference setup_helpers.py:249-294). Returns a dict with
    model/variables/state/trainer/loaders/config. ``config_path`` may be
    an already-loaded (and possibly modified) config dict.

    ``epochs`` overrides ``training.epochs``; ``synthetic`` forces the
    procedural dataset regardless of ``data.root_dir``. This is the single
    source of session wiring — the train CLI is a thin shell over it."""
    import jax

    from msid_tpu.data import get_dataloaders
    from msid_tpu.training import Trainer, TrainState
    from msid_tpu.utils.checkpointing import CheckpointManager

    setup_device(platform)
    # Deep-copy a caller-supplied dict: the epochs/synthetic overrides
    # below write into nested training/data dicts, and a shallow copy
    # would clobber the caller's config (re-run notebook cells, second
    # sessions built from the same dict).
    config = (
        copy.deepcopy(config_path) if isinstance(config_path, dict)
        else setup_config(config_path)
    )
    if epochs is not None:
        config.setdefault("training", {})["epochs"] = int(epochs)
    if synthetic:
        config.setdefault("data", {})["root_dir"] = "/nonexistent-forces-synthetic"
    seed = int(config.get("seed", 42)) if seed is None else seed

    train_loader, val_loader = get_dataloaders(config)
    model, variables, counts = create_model_from_config(config, seed)

    pretrained = config.get("model", {}).get("encoder", {}).get("pretrained_path")
    if pretrained and Path(pretrained).exists():
        from msid_tpu.models.convert import load_pretrained_encoder

        logger.info("Loading pretrained SatMAE weights from %s", pretrained)
        variables = load_pretrained_encoder(pretrained, variables)
    elif pretrained:
        logger.warning(
            "pretrained_path %s not found — training from scratch", pretrained
        )

    if getattr(model, "input_fill", False):
        # Fit the cross-band Gram for the dead-band fill stage
        # (ops/fill.py) over the full train split. One pass over the
        # tiles (~seconds); a checkpoint restore later replaces this
        # with the run's own fitted value.
        import jax.numpy as jnp

        from msid_tpu.ops.fill import fit_gram_from_config

        logger.info("Fitting dead-band fill Gram on the train split...")
        variables["params"]["fill_gram"] = jnp.asarray(
            fit_gram_from_config(config))

    tx, schedule, _, _ = create_training_components(
        config, variables, steps_per_epoch=max(1, len(train_loader))
    )
    state = TrainState.create(variables, tx)

    ckpt_cfg = config.get("checkpoint", {})
    manager = CheckpointManager(
        Path(output_dir) / "checkpoints",
        keep_top_k=int(ckpt_cfg.get("keep_top_k", 3)),
        metric=str(ckpt_cfg.get("metric", "val_psnr")),
        mode="min" if "loss" in str(ckpt_cfg.get("metric", "val_psnr")) else "max",
        save_every=int(ckpt_cfg.get("save_every", 1)),
        moments_dtype=ckpt_cfg.get("moments_dtype"),
        background_transfer=bool(ckpt_cfg.get("background_transfer", False)),
    )
    trainer = Trainer(
        model, tx, state, config=config,
        checkpoint_manager=manager, lr_schedule=schedule, seed=seed,
    )
    return {
        "config": config,
        "model": model,
        "variables": variables,
        "state": state,
        "trainer": trainer,
        "train_loader": train_loader,
        "val_loader": val_loader,
        "checkpoint_manager": manager,
        "param_counts": counts,
    }


def print_config_summary(config: dict) -> None:
    """Human-readable key-facts summary (reference setup_helpers.py:297-338)."""
    data = config.get("data", {})
    enc = config.get("model", {}).get("encoder", {})
    training = config.get("training", {})
    print("=" * 56)
    print("msid_tpu configuration")
    print("-" * 56)
    print(f"  data:    {data.get('root_dir')}  {data.get('image_size')}px "
          f"x{data.get('num_bands')} bands")
    print(f"  encoder: dim={enc.get('embed_dim')} depth={enc.get('depth')} "
          f"heads={enc.get('num_heads')} frozen={enc.get('freeze_layers')}")
    print(f"  train:   epochs={training.get('epochs')} "
          f"eff_batch={training.get('effective_batch_size')} "
          f"micro={training.get('micro_batch_size')} "
          f"lr={training.get('optimizer', {}).get('lr')}")
    print(f"  loss:    {training.get('loss')}")
    print("=" * 56)
