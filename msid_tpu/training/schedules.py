"""LR schedules: cosine annealing with warm restarts (SGDR).

Replaces torch `CosineAnnealingWarmRestarts` (reference
`scripts/train.py:155-160`, stepped per optimizer step at
`trainer.py:210-211`) with a pure optax-style schedule function built from
`optax.join_schedules`. Step units are optimizer steps, matching the
reference's *effective* behavior (its T_0 was nominally epochs but it
stepped the scheduler per accumulated step — SURVEY §2 latent defect 3;
here the unit is explicit and configurable via ``steps_per_cycle_unit``).
"""

from __future__ import annotations

import numpy as np
import optax


def cosine_warm_restarts(
    base_lr: float,
    t_0: int,
    t_mult: int = 1,
    eta_min: float = 0.0,
    max_steps: int = 1_000_000,
    steps_per_cycle_unit: int = 1,
) -> optax.Schedule:
    """SGDR schedule: cosine from base_lr→eta_min over T_0 units, restart,
    next cycle T_0*t_mult units, etc.

    Args:
        steps_per_cycle_unit: multiply cycle lengths by this (e.g. pass
            steps_per_epoch to express T_0 in epochs).
    """
    schedules, boundaries = [], []
    total = 0
    cycle = max(1, int(t_0)) * max(1, int(steps_per_cycle_unit))
    while total < max_steps:
        schedules.append(
            optax.cosine_decay_schedule(
                init_value=base_lr,
                decay_steps=cycle,
                alpha=eta_min / base_lr if base_lr > 0 else 0.0,
            )
        )
        total += cycle
        boundaries.append(total)
        cycle = cycle * max(1, int(t_mult))
    return optax.join_schedules(schedules, boundaries[:-1])


def build_schedule(config: dict, steps_per_epoch: int = 1) -> optax.Schedule:
    """Build from the reference YAML schema (`training.scheduler`).

    The reference's scheduler was stepped once per optimizer step with
    T_0 expressed nominally in epochs; we honor T_0 in optimizer-step
    units by default (reference effective behavior) unless
    ``scheduler.unit: epoch`` is set.
    """
    training = config.get("training", {})
    opt = training.get("optimizer", {})
    sched = training.get("scheduler", {})
    base_lr = float(opt.get("lr", 1e-4))
    kind = str(sched.get("type", "CosineAnnealingWarmRestarts"))

    if kind.lower() in ("cosineannealingwarmrestarts", "sgdr", "cosine_warm_restarts"):
        unit = str(sched.get("unit", "step"))
        scale = steps_per_epoch if unit == "epoch" else 1
        return cosine_warm_restarts(
            base_lr=base_lr,
            t_0=int(sched.get("T_0", 10)),
            t_mult=int(sched.get("T_mult", 2)),
            eta_min=float(sched.get("eta_min", 1e-6)),
            steps_per_cycle_unit=scale,
        )
    if kind.lower() in ("cosine", "cosineannealinglr"):
        return optax.cosine_decay_schedule(
            base_lr,
            decay_steps=int(sched.get("T_max", 100)) * steps_per_epoch,
            alpha=float(sched.get("eta_min", 0.0)) / base_lr,
        )
    if kind.lower() in ("constant", "none"):
        return optax.constant_schedule(base_lr)
    raise ValueError(f"Unknown scheduler type: {kind}")
