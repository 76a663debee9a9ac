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

import math

import jax.numpy as jnp

import optax


def cosine_warm_restarts(
    base_lr: float,
    t_0: int,
    t_mult: int = 1,
    eta_min: float = 0.0,
    steps_per_cycle_unit: int = 1,
) -> optax.Schedule:
    """SGDR schedule: cosine from base_lr→eta_min over T_0 units, restart,
    next cycle T_0*t_mult units, etc. (torch CosineAnnealingWarmRestarts
    semantics).

    Closed form in the step counter — NOT optax.join_schedules: with
    t_mult=1 a joined schedule needs max_steps/T_0 branches (the
    quick_test config, T_0=5, would build 200k schedules and stall
    tracing for tens of minutes).

    Args:
        steps_per_cycle_unit: multiply cycle lengths by this (e.g. pass
            steps_per_epoch to express T_0 in epochs).
    """
    t0 = float(max(1, int(t_0)) * max(1, int(steps_per_cycle_unit)))
    m = float(max(1, int(t_mult)))
    span = base_lr - eta_min

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        if m == 1.0:
            frac = jnp.mod(t, t0) / t0
        else:
            # cycle n starts at t0*(m^n - 1)/(m - 1) and lasts t0*m^n.
            # The epsilon absorbs fp32 log/div rounding at exact restart
            # steps, where floor could land one cycle low and emit
            # frac=1.0 (lr=eta_min) instead of the restart peak.
            n = jnp.floor(
                jnp.log(t / t0 * (m - 1.0) + 1.0) / math.log(m) + 1e-5
            )
            start = t0 * (jnp.power(m, n) - 1.0) / (m - 1.0)
            length = t0 * jnp.power(m, n)
            frac = jnp.clip((t - start) / length, 0.0, 1.0)
        return eta_min + span * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule


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
