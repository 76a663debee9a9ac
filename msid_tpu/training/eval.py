"""Standalone model evaluation (reference `src/training/eval.py:12-70`).

Runs the jitted eval step over a loader with deterministic per-batch
corruption keys and prints/returns averaged PSNR/SSIM/SAM/RMSE.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

from msid_tpu.ops.noise import NoiseConfig
from msid_tpu.training.losses import LossConfig
from msid_tpu.training.train_state import make_eval_step

logger = logging.getLogger(__name__)


def split_batch_item(item):
    """(batch, true_count) from a loader item — loaders that pad the
    trailing batch to the static shape yield ``(batch, count)`` tuples,
    plain loaders yield bare arrays (count = batch size)."""
    if isinstance(item, (tuple, list)) and len(item) == 2:
        return item[0], int(item[1])
    return item, int(item.shape[0])


def run_eval_loop(eval_step, variables, loader, base_key, place=jnp.asarray) -> dict:
    """Accumulate eval-step metric sums over a loader with deterministic
    per-batch corruption keys; ONE host sync total (shared by
    Trainer.validate and evaluate_model — keep a single copy).

    The batch index is folded in as ``jnp.uint32``: a Python-int operand
    would bake a constant into the eager fold_in and trigger a fresh
    ~1-6 s remote compile per batch on relayed TPU transports. The true
    sample count rides along the same way (an int32 array operand), so a
    padded trailing batch reuses the full-shape executable.
    """
    sums = None
    for i, item in enumerate(loader):
        batch, count = split_batch_item(item)
        key = jax.random.fold_in(base_key, jnp.uint32(i))
        s = eval_step(variables, place(batch), key, jnp.int32(count))
        sums = s if sums is None else jax.tree_util.tree_map(jnp.add, sums, s)
    if sums is None:
        return {"loss": 0.0, "psnr": 0.0, "ssim": 0.0, "sam": 0.0, "rmse": 0.0,
                "num_samples": 0}
    host = jax.device_get(sums)
    count = max(float(host["count"]), 1.0)
    results = {
        k: float(host[k]) / count for k in ("loss", "psnr", "ssim", "sam", "rmse")
    }
    results["num_samples"] = int(count)
    return results


def evaluate_model(
    model,
    variables: dict,
    loader,
    loss_cfg: Optional[LossConfig] = None,
    noise_cfg: Optional[NoiseConfig] = None,
    image_size: Optional[int] = None,
    eval_seed: int = 1234,
    verbose: bool = True,
    tta: int = 1,
    forward_impl: str = "auto",
) -> dict:
    """Evaluate over a loader; one host sync total. Returns metric dict.

    ``tta`` > 1 self-ensembles over that many dihedral views of each
    noisy input (`msid_tpu.ops.tta`) before scoring. ``forward_impl``
    selects the eval graph (see `make_eval_step`): "auto" = "apply";
    "hybrid" (folded-BN) is opt-in — measured slower in-step on v5e.

    ``variables`` may be a tuple/list of variable dicts: the step then
    scores the MEAN restoration of the checkpoints (model ensembling,
    `make_eval_step(ensemble_size=N)`); composes with ``tta``.
    """
    ensemble_size = 1
    if isinstance(variables, (tuple, list)):
        ensemble_size = len(variables)
        variables = tuple(variables)
        if ensemble_size == 1:
            variables = variables[0]
    eval_step = make_eval_step(
        model,
        loss_cfg or LossConfig(),
        noise_cfg or NoiseConfig(),
        image_size=image_size or model.image_size,
        tta=tta,
        forward_impl=forward_impl,
        ensemble_size=ensemble_size,
    )
    results = run_eval_loop(
        eval_step, variables, loader, jax.random.PRNGKey(eval_seed)
    )
    if verbose:
        logger.info("=" * 50)
        logger.info("Evaluation results (%d samples):", results["num_samples"])
        logger.info("  PSNR: %.2f dB", results["psnr"])
        logger.info("  SSIM: %.4f", results["ssim"])
        logger.info("  SAM:  %.2f°", results["sam"])
        logger.info("  RMSE: %.4f", results["rmse"])
        logger.info("=" * 50)
    return results
