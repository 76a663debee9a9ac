"""Checkpoint management: Orbax-backed top-K retention + best tracking.

Capability parity with the reference's two overlapping systems
(`/root/reference/src/utils/checkpointing.py:17-284` top-K manager and
`src/training/trainer.py:300-367` full-state save/load), unified on one
Orbax `CheckpointManager`:

  * full train-state pytrees (params, batch_stats, opt_state, step) plus
    host metadata (epoch, history, config);
  * top-K retention ranked by a configurable metric/mode;
  * dual best-model tracking (best-by-loss and best-by-metric) — fixing
    reference defect #2 where `best_model_loss` compared a loss against a
    PSNR (trainer.py:423);
  * `load_latest` / `load_best` / `load_step`.
"""

from __future__ import annotations

import json
import logging
import threading
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def _cast_moments(state: Any, dtype) -> Any:
    """Cast the non-scalar fp32 leaves of ``state.opt_state`` (the AdamW
    m/v moment trees) to ``dtype``, leaving params, batch stats, schedule
    scalars, and integer counts untouched. No-op for states without an
    ``opt_state``/``replace`` (plain pytrees)."""
    import jax
    import jax.numpy as jnp

    if not (hasattr(state, "opt_state") and hasattr(state, "replace")):
        return state
    dtype = jnp.dtype(dtype)

    def cast(leaf):
        if (
            hasattr(leaf, "dtype")
            and leaf.dtype == jnp.float32
            and getattr(leaf, "ndim", 0) > 0
        ):
            return leaf.astype(dtype)
        return leaf

    return state.replace(opt_state=jax.tree.map(cast, state.opt_state))


class CheckpointManager:
    """Top-K retention checkpoint manager over Orbax."""

    def __init__(
        self,
        directory: str | Path,
        keep_top_k: int = 3,
        metric: str = "val_psnr",
        mode: str = "max",
        save_every: int = 1,
        async_save: bool = True,
        moments_dtype: Optional[str] = None,
        background_transfer: bool = False,
    ):
        """``moments_dtype`` (e.g. "bfloat16") casts the AdamW moment trees
        before saving — cuts the full-size state from ~1.5 GB to ~1.0 GB,
        which is pure device→host transfer time on relayed TPU transports.
        Restore casts back to the target's fp32; the one-time rounding
        perturbs the effective per-param Adam step by ≲0.4% at resume.
        Off by default (bit-exact resume).

        ``background_transfer`` snapshots the state on device (cheap) and
        runs the blocking device→host copy + Orbax save in a worker
        thread, so training epochs overlap the transfer instead of
        stalling on it. Saves stay ordered (one in flight at a time)."""
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.metric = metric
        self.mode = mode
        self.save_every = save_every
        self.moments_dtype = moments_dtype
        self.background_transfer = background_transfer
        self._save_thread: Optional[threading.Thread] = None
        self._save_error: Optional[BaseException] = None

        def best_fn(metrics: dict) -> float:
            return float(metrics.get(self.metric, float("-inf") if mode == "max" else float("inf")))

        # Async: the ~1.5 GB full-size train state takes ~3 min to write
        # synchronously; async overlaps the write with the next epochs and
        # only `close()`/`wait_until_finished` blocks on it.
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_top_k,
            best_fn=best_fn,
            best_mode=mode,
            create=True,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             metadata: Optional[dict] = None, force: bool = False) -> bool:
        """Save if the cadence (or `force`) says so. Returns True if saved."""
        if not force and self.save_every > 1 and step % self.save_every != 0:
            return False
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        metadata = dict(metadata or {})
        if self.moments_dtype and hasattr(state, "opt_state"):
            state = _cast_moments(state, self.moments_dtype)
            metadata["_moments_dtype"] = str(self.moments_dtype)
        if hasattr(state, "ema_params"):
            # Recorded so restore can adapt a target built without (or
            # with) the EMA shadow — old checkpoints simply lack the key.
            metadata["_has_ema"] = state.ema_params is not None

        if not self.background_transfer:
            args = ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                metadata=ocp.args.JsonSave(metadata),
            )
            return self._mgr.save(step, args=args, metrics=metrics, force=force)

        # Snapshot on device (a fused copy per leaf — milliseconds), then
        # hand the blocking device→host transfer to a worker thread so the
        # caller's train loop keeps stepping while the bytes move.
        import jax
        import jax.numpy as jnp

        self._join_save_thread()
        snapshot = jax.tree.map(
            lambda leaf: jnp.copy(leaf) if hasattr(leaf, "dtype") else leaf,
            state,
        )

        def _worker():
            try:
                args = ocp.args.Composite(
                    state=ocp.args.StandardSave(snapshot),
                    metadata=ocp.args.JsonSave(metadata),
                )
                self._mgr.save(step, args=args, metrics=metrics, force=force)
            except BaseException as exc:  # re-raised at the next sync point
                self._save_error = exc

        self._save_thread = threading.Thread(
            target=_worker, name=f"ckpt-save-{step}", daemon=True
        )
        self._save_thread.start()
        return True

    def _join_save_thread(self) -> None:
        if self._save_thread is not None:
            self._save_thread.join()
            self._save_thread = None
        if self._save_error is not None:
            err, self._save_error = self._save_error, None
            raise err

    def wait_until_finished(self) -> None:
        self._join_save_thread()
        self._mgr.wait_until_finished()

    def _restore(self, step: int, target: Any = None):
        self.wait_until_finished()  # drain any in-flight async save
        meta = self._mgr.restore(
            step, args=ocp.args.Composite(metadata=ocp.args.JsonRestore())
        )["metadata"]
        saved_dtype = (meta or {}).get("_moments_dtype")

        restore_target = target
        if target is not None and saved_dtype:
            # The on-disk moments are low-precision; restore into a
            # matching-dtype target, then cast back up to the caller's.
            restore_target = _cast_moments(target, saved_dtype)

        # EMA-shadow structure adaptation: a checkpoint written with
        # training.ema_decay > 0 carries an `ema_params` subtree; targets
        # built by evaluate/export (TrainState.create without ema) don't —
        # and vice versa for resuming a pre-EMA checkpoint into an
        # EMA-enabled run (the shadow is then re-seeded from the restored
        # params below). Checkpoints written before the field existed lack
        # the `ema_params` tree entry entirely (and the `_has_ema`
        # metadata key), so they restore through a name-matched field dict
        # without it — Orbax matches pytree keys by name, not container.
        reseed_ema = False
        legacy_no_ema = False
        saved_has_ema = (meta or {}).get("_has_ema", False)
        if restore_target is not None and hasattr(restore_target, "ema_params"):
            if saved_has_ema and restore_target.ema_params is None:
                import jax

                restore_target = restore_target.replace(
                    ema_params=jax.tree.map(lambda x: x, restore_target.params)
                )
            elif not saved_has_ema:
                reseed_ema = restore_target.ema_params is not None
                if "_has_ema" in (meta or {}):
                    # EMA-era checkpoint saved with the shadow disabled:
                    # the tree entry exists on disk as an empty node.
                    restore_target = restore_target.replace(ema_params=None)
                else:
                    legacy_no_ema = True

        if legacy_no_ema:
            import dataclasses

            fields = {
                f.name: getattr(restore_target, f.name)
                for f in dataclasses.fields(restore_target)
                if f.name != "ema_params"
            }
            restored = self._mgr.restore(
                step,
                args=ocp.args.Composite(state=ocp.args.StandardRestore(fields)),
            )["state"]
            state = restore_target.replace(**restored, ema_params=None)
        else:
            args = ocp.args.Composite(
                state=ocp.args.StandardRestore(restore_target)
                if restore_target is not None
                else ocp.args.StandardRestore(),
            )
            state = self._mgr.restore(step, args=args)["state"]
        if reseed_ema:
            import jax
            import jax.numpy as jnp

            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.params)
            )
            logger.info("checkpoint predates EMA — shadow re-seeded from "
                        "the restored params")
        if target is not None and saved_dtype:
            import jax
            import jax.numpy as jnp

            state = state.replace(
                opt_state=jax.tree.map(
                    lambda s, t: s.astype(t.dtype)
                    if hasattr(s, "dtype") and s.dtype != t.dtype
                    else s,
                    state.opt_state,
                    target.opt_state,
                )
            )
        return state, meta

    def load_latest(self, target: Any = None):
        """(state, metadata, step) for the newest checkpoint, or None."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        state, metadata = self._restore(step, target)
        return state, metadata, step

    def load_best(self, target: Any = None):
        """(state, metadata, step) for the best checkpoint by the ranking
        metric, or None."""
        step = self._mgr.best_step()
        if step is None:
            return None
        state, metadata = self._restore(step, target)
        return state, metadata, step

    def load_step(self, step: int, target: Any = None):
        state, metadata = self._restore(step, target)
        return state, metadata, step

    def load_weights(self, target_state: Any, best: bool = True,
                     prefer_ema: bool = True):
        """Weights-only warm start: graft params/batch_stats from a saved
        checkpoint into a freshly built TrainState, keeping the NEW run's
        optimizer state, schedule position, and step counter.

        This is the stage-B entry of the reference's two-stage recipe
        (`/root/reference/README.md:193-223`: stage B trains from stage
        A's best weights under a different freeze set and LR) — a full
        state restore cannot cross that boundary because changed
        ``freeze_layers`` change the optax multi_transform opt_state
        STRUCTURE. The checkpoint is restored raw (no target), so any
        opt-state/schedule mismatch is irrelevant.

        ``prefer_ema``: when the source run kept an EMA shadow, start
        from the shadow (its served/validated weights); the new run's own
        shadow (if any) is re-seeded from the grafted params.

        Returns ``(state, metadata, step)`` or None if no checkpoint.
        """
        step = self._mgr.best_step() if best else self._mgr.latest_step()
        if step is None and best:
            step = self._mgr.latest_step()
        if step is None:
            return None
        self.wait_until_finished()
        raw = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        saved, metadata = raw["state"], raw["metadata"]
        params = saved.get("params")
        ema = saved.get("ema_params")
        if prefer_ema and ema:
            logger.info("load_weights: starting from the source EMA shadow")
            params = ema
        import jax

        # dtype/placement discipline: match the target's leaves (raw
        # restore yields host numpy; bf16-moment casts never apply here).
        params = jax.tree.map(
            lambda new, ref: jax.numpy.asarray(new, getattr(ref, "dtype", None)),
            params, target_state.params)
        batch_stats = saved.get("batch_stats", target_state.batch_stats)
        if batch_stats and target_state.batch_stats:
            batch_stats = jax.tree.map(
                lambda new, ref: jax.numpy.asarray(new, getattr(ref, "dtype", None)),
                batch_stats, target_state.batch_stats)
        state = target_state.replace(
            params=params,
            batch_stats=batch_stats,
            ema_params=(jax.tree.map(jax.numpy.copy, params)
                        if target_state.ema_params is not None else None),
        )
        return state, metadata, step

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def close(self):
        self._join_save_thread()
        self._mgr.close()


def save_single(directory: str | Path, state: Any, metadata: Optional[dict] = None) -> None:
    """One-off checkpoint (e.g. best_model export), no retention policy."""
    directory = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory / "state", state, force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        (directory / "metadata.json").write_text(json.dumps(metadata, indent=2))


def load_single(directory: str | Path, target: Any = None):
    """Restore a `save_single` checkpoint; returns (state, metadata)."""
    directory = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(directory / "state", target)
    meta_path = directory / "metadata.json"
    metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, metadata
