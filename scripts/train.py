#!/usr/bin/env python
"""Training CLI — argument surface mirrors the reference
(`/root/reference/scripts/train.py:40-67`): --config / --resume /
--checkpoint / --device, plus TPU-build extras (--epochs override,
--synthetic to force procedural data).

Flow (reference train.py:70-207, TPU-native): load+validate config →
seed → dataloaders (raw tiles) → model + optimizer (freeze labels, SGDR,
encoder 0.1×LR) → optional pretrained SatMAE conversion → Trainer.fit
with Orbax top-K checkpointing and early stopping.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="Train the SatMAE multi-spectral denoiser (TPU)")
    p.add_argument("--config", type=str, default="configs/base.yaml")
    p.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="checkpoint directory to resume/warm-start from")
    p.add_argument("--device", type=str, default=None, help="jax platform override (tpu/cpu)")
    p.add_argument("--epochs", type=int, default=None, help="override config epochs")
    p.add_argument("--synthetic", action="store_true", help="force synthetic dataset")
    p.add_argument("--output-dir", type=str, default="outputs")
    return p.parse_args()


def main():
    args = parse_args()
    if args.device:
        import os

        # Env var alone is not enough: the interpreter's sitecustomize may
        # already have imported jax, after which JAX_PLATFORMS is baked into
        # the config holder. config.update wins as long as no backend has
        # been initialized yet.
        os.environ["JAX_PLATFORMS"] = args.device
        import jax as _jax

        _jax.config.update("jax_platforms", args.device)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    logger = logging.getLogger("train")

    import jax

    from msid_tpu.data import get_dataloaders
    from msid_tpu.models import SatMAERestoration, count_parameters, init_model
    from msid_tpu.training import Trainer, TrainState, build_optimizer_from_config
    from msid_tpu.utils.checkpointing import CheckpointManager
    from msid_tpu.utils.config import (
        coerce_scheduler_params,
        load_config,
        print_config,
        validate_config,
    )

    config = coerce_scheduler_params(load_config(args.config))
    validate_config(config)
    if args.epochs is not None:
        config["training"]["epochs"] = args.epochs
    if args.synthetic:
        config.setdefault("data", {})["root_dir"] = "/nonexistent-forces-synthetic"
    print_config(config)

    seed = int(config.get("seed", 42))
    logger.info("devices: %s", jax.devices())

    train_loader, val_loader = get_dataloaders(config)
    logger.info("train batches/epoch: %d, val batches: %d",
                len(train_loader), len(val_loader))

    import jax.numpy as jnp

    compute_dtype = (
        jnp.bfloat16 if config.get("training", {}).get("mixed_precision", True)
        else jnp.float32
    )
    model = SatMAERestoration.from_config(config, dtype=compute_dtype)
    variables = init_model(model, jax.random.PRNGKey(seed))
    counts = count_parameters(variables)
    logger.info("params: encoder=%.1fM decoder=%.1fM total=%.1fM",
                counts["encoder"] / 1e6, counts["decoder"] / 1e6, counts["total"] / 1e6)

    pretrained = config["model"]["encoder"].get("pretrained_path")
    if pretrained and Path(pretrained).exists():
        from msid_tpu.models.convert import load_pretrained_encoder

        logger.info("Loading pretrained SatMAE weights from %s", pretrained)
        variables = load_pretrained_encoder(pretrained, variables)
    elif pretrained:
        logger.warning("pretrained_path %s not found — training from scratch", pretrained)

    tx, schedule = build_optimizer_from_config(
        config, variables["params"], steps_per_epoch=max(1, len(train_loader))
    )
    state = TrainState.create(variables, tx)

    ckpt_cfg = config.get("checkpoint", {})
    out_dir = Path(args.output_dir)
    manager = CheckpointManager(
        out_dir / "checkpoints",
        keep_top_k=int(ckpt_cfg.get("keep_top_k", 3)),
        metric=str(ckpt_cfg.get("metric", "val_psnr")),
        mode="min" if "loss" in str(ckpt_cfg.get("metric", "val_psnr")) else "max",
        save_every=int(ckpt_cfg.get("save_every", 1)),
    )

    trainer = Trainer(
        model, tx, state, config=config,
        checkpoint_manager=manager, lr_schedule=schedule, seed=seed,
    )

    start_epoch = 0
    if args.resume or args.checkpoint:
        resume_mgr = manager
        if args.checkpoint:
            resume_mgr = CheckpointManager(args.checkpoint)
        start_epoch = trainer.load_checkpoint(resume_mgr)
        logger.info("Resumed from epoch %d", start_epoch)

    epochs = int(config["training"]["epochs"])
    history = trainer.fit(train_loader, val_loader, epochs, start_epoch=start_epoch)

    import json

    hist_path = out_dir / "logs" / "training_history.json"
    hist_path.parent.mkdir(parents=True, exist_ok=True)
    hist_path.write_text(json.dumps(history, indent=2))
    logger.info("Training complete. Best val PSNR: %.2f dB",
                max(history["val_psnr"]) if history["val_psnr"] else float("nan"))


if __name__ == "__main__":
    main()
