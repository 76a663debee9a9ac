"""Host-side training driver: epochs, validation, checkpoints, early stop.

Capability parity with the reference `Trainer`
(`/root/reference/src/training/trainer.py:25-510`): epoch loop with
gradient accumulation, NaN-skip protection with per-epoch abort threshold,
per-epoch validation, history dict, dual best-model tracking, early
stopping on metric plateau, KeyboardInterrupt-safe fit, checkpoint
save/resume.

TPU-first differences:
  * the entire batch→loss→grads→update path is ONE jitted call
    (`make_train_step`) — the host only feeds raw tiles and PRNG keys;
  * train metrics stay on device during the epoch (a list of device
    scalars) and sync once at epoch end; validation uses on-device metric
    sums (no per-sample `.item()`, reference trainer.py:280 / metrics.py:236-256);
  * validation corruption is deterministic per (eval_seed, batch index) —
    fixing reference defect #4 (resampled val noise each epoch);
  * best-by-loss and best-by-metric are tracked separately — fixing
    reference defect #2 (trainer.py:423 compared loss to a PSNR).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from msid_tpu.ops.noise import NoiseConfig, default_noise_impl
from msid_tpu.training.losses import LossConfig
from msid_tpu.training.train_state import TrainState, make_eval_step, make_train_step

logger = logging.getLogger(__name__)

MAX_NAN_SKIPS_PER_EPOCH = 10  # reference trainer.py:165-170


class Trainer:
    """Drives training of a restoration model on one chip or a mesh."""

    def __init__(
        self,
        model,
        tx,
        state: TrainState,
        config: Optional[dict] = None,
        loss_cfg: Optional[LossConfig] = None,
        noise_cfg: Optional[NoiseConfig] = None,
        checkpoint_manager=None,
        lr_schedule: Optional[Callable] = None,
        train_step: Optional[Callable] = None,
        eval_step: Optional[Callable] = None,
        seed: int = 42,
        eval_seed: int = 1234,
        log_every: int = 50,
    ):
        config = config or {}
        training = config.get("training", {})
        self.model = model
        self.tx = tx
        self.state = state
        self.mesh = None
        self.config = config
        self.loss_cfg = loss_cfg or LossConfig.from_config(config)
        self.noise_cfg = noise_cfg or NoiseConfig.from_config(config)
        self.ckpt = checkpoint_manager
        self.lr_schedule = lr_schedule
        self.seed = seed
        self.eval_seed = eval_seed
        self.log_every = log_every

        image_size = int(config.get("data", {}).get("image_size", model.image_size))
        accum = int(training.get("gradient_accumulation_steps", 1))
        # The reference accumulates only to fit a 6 GB GPU; on a chip with
        # enough HBM one big batch is ~1.65x faster (same math — measured
        # 187 vs 308 ms/step at effective batch 64 on v5e). Collapse unless
        # the config pins it with auto_accum: false.
        if accum > 1 and bool(training.get("auto_accum", True)):
            num_params = sum(
                int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(state.variables["params"])
            )
            if self._memory_fits(config, accum, image_size, num_params=num_params):
                logger.info(
                    "collapsing gradient accumulation %dx -> 1 (fits in HBM; "
                    "set training.auto_accum: false to keep)", accum,
                )
                accum = 1
        self.accum_steps = accum

        # 'auto' → Pallas fused corruption on TPU, XLA-fused jnp elsewhere.
        noise_impl = str(config.get("noise", {}).get("impl", "auto"))
        if noise_impl == "auto":
            noise_impl = default_noise_impl()

        # EMA of params (additive over the reference; opt-in). The shadow
        # must exist in the state BEFORE mesh placement so it is
        # replicated/sharded with everything else.
        self.ema_decay = float(training.get("ema_decay", 0.0))
        if self.ema_decay > 0.0 and self.state.ema_params is None:
            self.state = self.state.replace(
                ema_params=jax.tree_util.tree_map(jnp.copy, self.state.params)
            )
            logger.info("EMA of params enabled (decay %.5g); validation and "
                        "best-model tracking use the shadow weights",
                        self.ema_decay)

        # Mesh data parallelism (SURVEY §5.8 — additive over the reference):
        # batch sharded over the 'data' axis, state replicated, gradient
        # all-reduce compiled by XLA. Enabled when >1 device is visible
        # (or parallel.num_devices requests a subset).
        par = config.get("parallel", {})
        requested = int(par.get("num_devices", -1))
        visible = len(jax.devices())
        n_devices = visible if requested < 0 else min(requested, visible)
        if n_devices > 1 and par.get("enabled", True):
            from msid_tpu.parallel import make_mesh, replicate

            self.mesh = make_mesh(num_devices=n_devices)
            self.state = replicate(self.state, self.mesh)
            # On a mesh the batch axis shards across chips — gradient
            # accumulation is unnecessary; keep the configured accum only
            # if explicitly forced.
            if not par.get("keep_grad_accum", False):
                accum = 1
                self.accum_steps = 1
            logger.info("data-parallel mesh over %d devices", n_devices)

        # donate=True: the previous TrainState's ~2.3 GB of buffers are
        # reused for the new state instead of copied. The old state object
        # is invalid after each step — the Trainer always replaces
        # self.state, so nothing else may hold it.
        # Perceptual-loss implementation: the reference's VGG16 feature MSE
        # when usable weights are configured, else the Sobel edge stand-in.
        vgg_params = None
        if self.loss_cfg.perceptual_weight > 0:
            from msid_tpu.training.perceptual import resolve_perceptual

            _, vgg_params = resolve_perceptual(training.get("loss", {}))

        augment = training.get("augment", {})
        self.train_step = train_step or make_train_step(
            model, tx, self.loss_cfg, self.noise_cfg,
            accum_steps=accum, image_size=image_size, noise_impl=noise_impl,
            donate=True, mesh=self.mesh,
            band_permutation_prob=float(
                augment.get("band_permutation_prob", 0.0)
            ),
            vgg_params=vgg_params,
            ema_decay=self.ema_decay,
        )
        self.eval_step = eval_step or make_eval_step(
            model, self.loss_cfg, self.noise_cfg, image_size=image_size,
            noise_impl=noise_impl, mesh=self.mesh, vgg_params=vgg_params,
            # training.eval_forward: auto (default) serves the folded-BN
            # hybrid graph in validation when the model supports it —
            # the deploy graph is what gets scored, as in the reference.
            forward_impl=str(training.get("eval_forward", "auto")),
        )

        es = config.get("early_stopping", {})
        self.early_stopping_enabled = bool(es.get("enabled", False))
        self.patience = int(es.get("patience", 10))
        self.min_delta = float(es.get("min_delta", 0.1))

        self.history: Dict[str, list] = {
            "train_loss": [], "val_loss": [], "val_psnr": [], "val_ssim": [],
            "val_sam": [], "val_rmse": [], "lr": [], "epoch_time": [],
        }
        self.best_val_loss = float("inf")
        self.best_val_metric = float("-inf")  # PSNR, higher better
        self.epochs_without_improvement = 0

    @staticmethod
    def _memory_fits(config: dict, accum: int, image_size: int,
                     num_params: int, safety: float = 0.7,
                     limit_gb: Optional[float] = None) -> bool:
        """Would the un-accumulated full batch fit in device memory?
        Analytic estimate (utils.setup_helpers.estimate_memory) with the
        micro batch scaled by ``accum`` and the LIVE model's parameter
        count (a hardcoded flagship-scale bound would collapse a 300M-param
        vit_large into an OOM), against the device's HBM if the runtime
        exposes it (default assumption 16 GB for TPU, 8 GB else)."""
        from msid_tpu.utils.setup_helpers import estimate_memory

        training = dict(config.get("training", {}))
        micro = int(training.get("micro_batch_size", 8)) * accum
        cfg = dict(config, training=dict(training, micro_batch_size=micro))
        est = estimate_memory(cfg, num_params)["total_gb"]

        if limit_gb is None:
            limit_gb = 16.0 if jax.default_backend() == "tpu" else 8.0
            stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
            if stats and stats.get("bytes_limit"):
                limit_gb = stats["bytes_limit"] / 1e9
        return est < safety * limit_gb

    # ---------------- epoch-level ----------------

    def _place_batch(self, batch):
        """Device placement: sharded over the mesh's data axis, or plain."""
        if self.mesh is None:
            return jnp.asarray(batch)
        from msid_tpu.parallel import shard_batch

        n = self.mesh.devices.size
        if batch.shape[0] % n != 0:
            raise ValueError(
                f"batch size {batch.shape[0]} not divisible by the "
                f"{n}-device mesh — adjust micro_batch_size/accum"
            )
        if isinstance(batch, jax.Array):
            # Device-resident batches (DeviceCachedLoader) reshard
            # device-to-device; np.asarray would round-trip via host.
            return shard_batch(batch, self.mesh)
        return shard_batch(np.asarray(batch), self.mesh)

    def train_epoch(self, loader, epoch: int) -> Dict[str, float]:
        """One epoch; returns {'loss','skipped','steps'}. Metrics stay on
        device until the end-of-epoch sync."""
        # NB: fold_in with a *Python int* bakes the value into the program as
        # a constant → a new tiny compile per distinct value (measured ~1-2 s
        # each through a remote-compile transport, dominating short epochs).
        # Array-typed fold values hit the jit cache once.
        base_key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed), jnp.uint32(epoch)
        )
        skips_at_start = int(jax.device_get(self.state.nan_skips))
        losses = []
        t0 = time.time()
        for i, batch in enumerate(loader):
            key = jax.random.fold_in(base_key, jnp.uint32(i))
            self.state, metrics = self.train_step(
                self.state, self._place_batch(batch), key
            )
            losses.append(metrics["loss"])

            # Host syncs only every log_every batches — a per-batch
            # device_get would serialize dispatch against execution.
            if self.log_every and (i + 1) % self.log_every == 0:
                loss_val = float(jax.device_get(metrics["loss"]))
                logger.info(
                    "epoch %d batch %d/%d loss=%.5f (%.2f batch/s)",
                    epoch, i + 1, len(loader), loss_val, (i + 1) / (time.time() - t0),
                )
                skips = int(jax.device_get(self.state.nan_skips)) - skips_at_start
                if skips > MAX_NAN_SKIPS_PER_EPOCH:
                    raise RuntimeError(
                        f"Aborting epoch {epoch}: {skips} non-finite batches "
                        f"(> {MAX_NAN_SKIPS_PER_EPOCH}). Check LR / data health."
                    )

        losses = jax.device_get(losses)  # single bulk sync
        skipped = int(jax.device_get(self.state.nan_skips)) - skips_at_start
        if skipped > MAX_NAN_SKIPS_PER_EPOCH:
            raise RuntimeError(
                f"Epoch {epoch} had {skipped} non-finite batches "
                f"(> {MAX_NAN_SKIPS_PER_EPOCH}). Check LR / data health."
            )
        return {
            "loss": float(np.mean(losses)) if losses else 0.0,
            "skipped": skipped,
            "steps": len(losses),
        }

    def validate(self, loader) -> Dict[str, float]:
        """Deterministically-corrupted validation; one host sync total.

        The val loader keeps every sample (no drop_last) and pads the
        trailing partial batch to the static batch shape, yielding
        ``(batch, true_count)`` — the eval step masks the padding, so
        every val-set size costs exactly ONE eval-step compile. On a mesh
        an un-padded indivisible batch (non-BatchLoader sources) is still
        trimmed to the device-count multiple with a warning.
        """
        from msid_tpu.training.eval import run_eval_loop, split_batch_item

        batches = loader
        if self.mesh is not None:
            n = self.mesh.devices.size

            def mesh_sized(src=loader, n=n):
                for item in src:
                    b, count = split_batch_item(item)
                    rem = b.shape[0] % n
                    if rem:
                        if b.shape[0] < n:
                            logger.warning(
                                "val batch of %d smaller than the %d-device "
                                "mesh — skipped", b.shape[0], n)
                            continue
                        logger.warning(
                            "trimming val batch %d -> %d for the %d-device "
                            "mesh", b.shape[0], b.shape[0] - rem, n)
                        b = b[: b.shape[0] - rem]
                    yield b, min(count, b.shape[0])

            batches = mesh_sized()

        results = run_eval_loop(
            self.eval_step, self.state.eval_variables, batches,
            jax.random.PRNGKey(self.eval_seed), place=self._place_batch,
        )
        results.pop("num_samples", None)
        return results

    # ---------------- fit ----------------

    def fit(self, train_loader, val_loader, epochs: int,
            start_epoch: int = 0) -> Dict[str, list]:
        """Full training loop. Returns the history dict (reference
        trainer.py:370-492), robust to KeyboardInterrupt."""
        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.time()
                train_m = self.train_epoch(train_loader, epoch)
                val_m = self.validate(val_loader)
                dt = time.time() - t0

                lr = (
                    float(self.lr_schedule(int(jax.device_get(self.state.step))))
                    if self.lr_schedule is not None else float("nan")
                )
                self.history["train_loss"].append(train_m["loss"])
                self.history["val_loss"].append(val_m["loss"])
                self.history["val_psnr"].append(val_m["psnr"])
                self.history["val_ssim"].append(val_m["ssim"])
                self.history["val_sam"].append(val_m["sam"])
                self.history["val_rmse"].append(val_m["rmse"])
                self.history["lr"].append(lr)
                self.history["epoch_time"].append(dt)

                logger.info(
                    "epoch %d/%d: train_loss=%.5f val_loss=%.5f "
                    "val_psnr=%.2fdB val_ssim=%.4f val_sam=%.2f° "
                    "lr=%.2e skipped=%d (%.1fs)",
                    epoch + 1, epochs, train_m["loss"], val_m["loss"],
                    val_m["psnr"], val_m["ssim"], val_m["sam"],
                    lr, train_m["skipped"], dt,
                )

                improved_metric = val_m["psnr"] > self.best_val_metric + (
                    self.min_delta if self.early_stopping_enabled else 0.0
                )
                if val_m["loss"] < self.best_val_loss:
                    self.best_val_loss = val_m["loss"]
                if val_m["psnr"] > self.best_val_metric:
                    self.best_val_metric = val_m["psnr"]

                if self.ckpt is not None:
                    metrics = {
                        "val_loss": val_m["loss"], "val_psnr": val_m["psnr"],
                        "val_ssim": val_m["ssim"], "val_sam": val_m["sam"],
                    }
                    self.ckpt.save(
                        epoch + 1, self.state, metrics=metrics,
                        metadata={"epoch": epoch + 1, "history": self.history,
                                  "config": _jsonable(self.config)},
                        force=(epoch + 1 == epochs),
                    )

                if self.early_stopping_enabled:
                    if improved_metric:
                        self.epochs_without_improvement = 0
                    else:
                        self.epochs_without_improvement += 1
                        if self.epochs_without_improvement >= self.patience:
                            logger.info(
                                "Early stopping at epoch %d (no val_psnr "
                                "improvement > %.3f for %d epochs)",
                                epoch + 1, self.min_delta, self.patience,
                            )
                            break
        except KeyboardInterrupt:
            logger.warning("Training interrupted — returning partial history")
        finally:
            if self.ckpt is not None and hasattr(self.ckpt, "wait_until_finished"):
                self.ckpt.wait_until_finished()  # drain async saves
        return self.history

    # ---------------- resume ----------------

    def load_checkpoint(self, manager=None, step: Optional[int] = None,
                        best: bool = False) -> int:
        """Restore state (+epoch) from a CheckpointManager. Returns the epoch
        to resume from (0 if nothing found)."""
        manager = manager or self.ckpt
        if manager is None:
            return 0
        if step is not None:
            out = manager.load_step(step, target=self.state)
        elif best:
            out = manager.load_best(target=self.state)
        else:
            out = manager.load_latest(target=self.state)
        if out is None:
            return 0
        state, metadata, ckpt_step = out
        if self.ema_decay <= 0.0 and state.ema_params is not None:
            # The checkpoint carried an EMA shadow but this run trains
            # without EMA: the restored shadow would never be updated, so
            # eval_variables would score the restore-time weights forever
            # (frozen validation / best-K / early-stop). Drop it — the
            # live params become the served weights, matching ema_decay=0
            # semantics.
            logger.info(
                "checkpoint carries an EMA shadow but training.ema_decay "
                "is 0 — dropping the shadow; validation serves live params"
            )
            state = state.replace(ema_params=None)
        self.state = state
        history = (metadata or {}).get("history")
        if history:
            self.history = history
            if history.get("val_loss"):
                self.best_val_loss = min(history["val_loss"])
            if history.get("val_psnr"):
                self.best_val_metric = max(history["val_psnr"])
        return int((metadata or {}).get("epoch", ckpt_step))


def _jsonable(obj):
    """Best-effort conversion of a config dict to JSON-safe values."""
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
