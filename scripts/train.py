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
    p.add_argument("--init-from", type=str, default=None,
                   help="weights-only warm start from another run's "
                        "checkpoint dir (params/batch_stats grafted, fresh "
                        "optimizer/schedule) — the stage-B entry of the "
                        "two-stage recipe, reference README.md:193-223")
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
        # Force the platform BEFORE any module that can initialize a jax
        # backend is imported (orbax touches jax at import time; once a
        # backend exists, jax_platforms updates no longer take effect and
        # the run silently lands on the default TPU backend).
        import jax as _jax

        _jax.config.update("jax_platforms", args.device)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    logger = logging.getLogger("train")

    from msid_tpu.utils.checkpointing import CheckpointManager
    from msid_tpu.utils.config import print_config
    from msid_tpu.utils.setup_helpers import setup_training_session

    session = setup_training_session(
        args.config,
        output_dir=args.output_dir,
        platform=args.device,
        epochs=args.epochs,
        synthetic=args.synthetic,
    )
    config, trainer = session["config"], session["trainer"]
    print_config(config)
    logger.info("train batches/epoch: %d, val batches: %d",
                len(session["train_loader"]), len(session["val_loader"]))

    start_epoch = 0
    if args.init_from:
        if args.resume or args.checkpoint:
            raise SystemExit("--init-from is a weights-only warm start; "
                             "it cannot be combined with --resume/--checkpoint")
        out = CheckpointManager(args.init_from).load_weights(trainer.state)
        if out is None:
            raise FileNotFoundError(f"No checkpoint under {args.init_from}")
        trainer.state, _, src_step = out
        logger.info("Warm-started weights from %s (step %d); fresh optimizer",
                    args.init_from, src_step)
    elif args.resume or args.checkpoint:
        resume_mgr = session["checkpoint_manager"]
        if args.checkpoint:
            resume_mgr = CheckpointManager(args.checkpoint)
        start_epoch = trainer.load_checkpoint(resume_mgr)
        logger.info("Resumed from epoch %d", start_epoch)

    epochs = int(config["training"]["epochs"])
    history = trainer.fit(
        session["train_loader"], session["val_loader"], epochs,
        start_epoch=start_epoch,
    )

    import json

    hist_path = Path(args.output_dir) / "logs" / "training_history.json"
    hist_path.parent.mkdir(parents=True, exist_ok=True)
    hist_path.write_text(json.dumps(history, indent=2))
    logger.info("Training complete. Best val PSNR: %.2f dB",
                max(history["val_psnr"]) if history["val_psnr"] else float("nan"))


if __name__ == "__main__":
    main()
