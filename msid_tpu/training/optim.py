"""Optimizer construction: AdamW + SGDR + freeze/LR-scale param groups.

TPU-native replacements for the reference's optimizer plumbing:

  * layer freezing (`requires_grad=False` over listed encoder blocks,
    reference `encoder.py:270-293`) → optax ``multi_transform`` with
    ``set_to_zero`` on frozen-block labels;
  * encoder 0.1×LR / decoder full LR param groups
    (`satmae_restoration.py:195-242`) → per-label LR-scaled adamw chains;
  * global grad-norm clipping before the per-group transforms
    (`trainer.py:189-197`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax

ENCODER_LR_SCALE_DEFAULT = 0.1


def label_params(params, freeze_layers: Sequence[int] = ()) -> dict:
    """Label each param leaf: 'frozen' | 'encoder' | 'decoder'.

    Frozen = encoder transformer blocks whose index is in ``freeze_layers``
    (patch_embed / pos_embed / final norm stay trainable, matching the
    reference which only froze listed blocks). Everything outside the
    encoder is 'decoder' (the reference's catch-all group).
    """
    frozen_names = {f"blocks_{i}" for i in freeze_layers}

    def _label(path, _leaf) -> str:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if "fill_gram" in keys:
            # The train-fit cross-band Gram (ops/fill.py) is a measured
            # statistic, not a weight: AdamW weight decay would pull it
            # toward zero-fill, so it stays frozen.
            return "frozen"
        if "encoder" in keys:
            if any(k in frozen_names for k in keys):
                return "frozen"
            return "encoder"
        return "decoder"

    return jax.tree_util.tree_map_with_path(_label, params)


def build_optimizer(
    schedule: optax.Schedule,
    weight_decay: float = 0.05,
    betas: Sequence[float] = (0.9, 0.999),
    gradient_clip: float = 1.0,
    encoder_lr_scale: float = ENCODER_LR_SCALE_DEFAULT,
    freeze_layers: Sequence[int] = (),
    params=None,
) -> optax.GradientTransformation:
    """Full optax chain: clip_by_global_norm → per-group adamw/zero."""

    def _adamw(scale: float) -> optax.GradientTransformation:
        return optax.adamw(
            learning_rate=lambda step: schedule(step) * scale,
            b1=float(betas[0]),
            b2=float(betas[1]),
            weight_decay=float(weight_decay),
        )

    labels = label_params(params, freeze_layers) if params is not None else None
    grouped = optax.multi_transform(
        {
            "frozen": optax.set_to_zero(),
            "encoder": _adamw(encoder_lr_scale),
            "decoder": _adamw(1.0),
        },
        labels if labels is not None else (lambda p: label_params(p, freeze_layers)),
    )
    if gradient_clip and gradient_clip > 0:
        return optax.chain(optax.clip_by_global_norm(float(gradient_clip)), grouped)
    return grouped


def build_optimizer_from_config(
    config: dict, params, steps_per_epoch: int = 1
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Construct (optimizer, lr_schedule) from the reference YAML schema."""
    from msid_tpu.training.schedules import build_schedule

    training = config.get("training", {})
    opt = training.get("optimizer", {})
    schedule = build_schedule(config, steps_per_epoch)
    freeze = config.get("model", {}).get("encoder", {}).get("freeze_layers") or ()
    tx = build_optimizer(
        schedule,
        weight_decay=float(opt.get("weight_decay", 0.05)),
        betas=[float(b) for b in opt.get("betas", (0.9, 0.999))],
        gradient_clip=float(training.get("gradient_clip", 1.0)),
        encoder_lr_scale=float(opt.get("encoder_lr_scale", ENCODER_LR_SCALE_DEFAULT)),
        freeze_layers=tuple(int(i) for i in freeze),
        params=params,
    )
    return tx, schedule
