#!/usr/bin/env python
"""Evaluation CLI — surface mirrors the reference
(`/root/reference/scripts/evaluate.py:28-34`): --config / --checkpoint /
--save_visualizations, running the val split through the jitted eval path
with deterministic corruption.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a trained denoiser (TPU)")
    p.add_argument("--config", type=str, default="configs/base.yaml")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="checkpoint directory (Orbax manager root)")
    p.add_argument("--save_visualizations", action="store_true")
    p.add_argument("--output-dir", type=str, default="outputs")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--device", type=str, default=None, help="jax platform override (tpu/cpu)")
    p.add_argument("--raw-weights", action="store_true",
                   help="evaluate the live params even when the checkpoint "
                        "carries an EMA shadow (EMA-vs-live ablation)")
    p.add_argument("--ensemble", type=str, nargs="+", default=None,
                   metavar="CKPT_DIR",
                   help="additional checkpoint dir(s) to ensemble with "
                        "--checkpoint: metrics score the MEAN restoration "
                        "of all checkpoints (~N x eval FLOPs; composes "
                        "with --tta). All checkpoints must share the "
                        "--config architecture.")
    p.add_argument("--tta", type=int, nargs="?", const=8, default=1,
                   metavar="N",
                   help="self-ensemble over N dihedral views of each noisy "
                        "input (1-8; bare --tta means 8). ~N x eval cost.")
    p.add_argument("--forward", choices=("auto", "apply", "hybrid"),
                   default="auto",
                   help="eval forward graph: auto (= apply; measured "
                        "faster than the in-step folded-BN hybrid on v5e), "
                        "apply, hybrid (opt-in)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.device:
        import os

        # sitecustomize may have imported jax already; config.update wins
        # as long as no backend has been initialized yet.
        os.environ["JAX_PLATFORMS"] = args.device
        import jax as _jax

        _jax.config.update("jax_platforms", args.device)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s: %(message)s")
    logger = logging.getLogger("evaluate")

    import jax
    import jax.numpy as jnp

    from msid_tpu.data import get_dataloaders
    from msid_tpu.models import SatMAERestoration, init_model
    from msid_tpu.training import evaluate_model
    from msid_tpu.utils.checkpointing import CheckpointManager
    from msid_tpu.utils.config import coerce_scheduler_params, load_config

    config = coerce_scheduler_params(load_config(args.config))
    config["model"]["encoder"]["pretrained_path"] = None  # reference evaluate.py:50-52
    # Fail fast on an invalid --tta (range 1-8) before checkpoint load and
    # dataset setup, not at first eval-step trace.
    from msid_tpu.ops.tta import orbit_prefix

    image_size = int(config["data"].get("image_size", 192))
    orbit_prefix(args.tta, image_size, image_size)
    if args.synthetic:
        config.setdefault("data", {})["root_dir"] = "/nonexistent-forces-synthetic"

    compute_dtype = (
        jnp.bfloat16 if config.get("training", {}).get("mixed_precision", True)
        else jnp.float32
    )
    model = SatMAERestoration.from_config(config, dtype=compute_dtype)
    variables = init_model(model, jax.random.PRNGKey(int(config.get("seed", 42))))

    restored_step = None
    if args.ensemble and not args.checkpoint:
        raise SystemExit("--ensemble extends --checkpoint; pass --checkpoint too")
    ensemble_steps = []
    if args.checkpoint:
        from msid_tpu.training import TrainState, build_optimizer_from_config

        tx, _ = build_optimizer_from_config(config, variables["params"])
        target = TrainState.create(variables, tx)

        def load_eval_variables(ckpt_dir):
            mgr = CheckpointManager(ckpt_dir)
            out = mgr.load_best(target=target) or mgr.load_latest(target=target)
            if out is None:
                raise FileNotFoundError(f"No checkpoint found under {ckpt_dir}")
            state, _, step = out
            # eval_variables = the EMA shadow when the run trained with
            # training.ema_decay > 0 (what the trainer validated with);
            # --raw-weights forces the live params for EMA-vs-live ablations.
            v = state.variables if args.raw_weights else state.eval_variables
            if args.raw_weights and state.ema_params is not None:
                logger.info("--raw-weights: evaluating live params, not the "
                            "EMA shadow")
            logger.info("Restored checkpoint step %d from %s", step, ckpt_dir)
            return v, int(step)

        variables, restored_step = load_eval_variables(args.checkpoint)
        if args.ensemble:
            members = [variables]
            ensemble_steps = [restored_step]
            for extra in args.ensemble:
                v, s = load_eval_variables(extra)
                members.append(v)
                ensemble_steps.append(s)
            variables = tuple(members)
            logger.info("Ensembling %d checkpoints (mean restoration)",
                        len(members))

    _, val_loader = get_dataloaders(config)
    from msid_tpu.ops.noise import NoiseConfig
    from msid_tpu.training.losses import LossConfig

    results = evaluate_model(
        model, variables, val_loader,
        loss_cfg=LossConfig.from_config(config),
        noise_cfg=NoiseConfig.from_config(config),
        image_size=int(config["data"].get("image_size", 192)),
        tta=args.tta,
        forward_impl=args.forward,
    )
    if args.tta > 1:
        results["tta"] = args.tta
        logger.info("Metrics above use %d-view dihedral self-ensembling", args.tta)
    if args.ensemble:
        results["ensemble"] = len(ensemble_steps)

    # Provenance block (ADVICE r4): committed copies of this artifact
    # (benchmarks/results/r4_eval/) must be attributable to an exact
    # config + checkpoint step without relying on the filename.
    import datetime

    results["provenance"] = {
        "config": args.config,
        "checkpoint": args.checkpoint,
        "checkpoint_step": restored_step,
        "ensemble": args.ensemble,
        "ensemble_steps": ensemble_steps or None,
        "forward": args.forward,
        "tta": args.tta,
        "raw_weights": bool(args.raw_weights),
        "date_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"),
    }

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "evaluation_results.json").write_text(
        json.dumps(results, indent=2) + "\n")

    if args.save_visualizations:
        from msid_tpu.utils.visualization import save_restoration_triptychs

        save_restoration_triptychs(
            model,
            variables[0] if isinstance(variables, tuple) else variables,
            val_loader, out_dir / "visualizations",
            noise_cfg=NoiseConfig.from_config(config),
            image_size=int(config["data"].get("image_size", 192)),
            num_samples=5,
        )
        logger.info("Saved visualizations to %s", out_dir / "visualizations")


if __name__ == "__main__":
    main()
