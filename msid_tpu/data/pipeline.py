"""Host input pipeline: batched tile feeding with background prefetch.

Replaces the reference's torch DataLoader (`src/data/dataloader.py:18-121`,
which ran with ``num_workers: 0`` — fully synchronous host preprocessing).
Here the host work is only: read raw tiles, stack, hand to the device.
A small thread pool overlaps tile reads with device compute; corruption
and resize are NOT done here (they're on-device, see ops/).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class DeviceCacheTooLarge(ValueError):
    """Raised by :class:`DeviceCachedLoader` when the stacked tile set
    exceeds its byte budget after storage-dtype resolution; callers fall
    back to the host :class:`BatchLoader`."""


class BatchLoader:
    """Iterates seeded, shuffled batches of raw tiles as numpy arrays.

    Args:
        dataset: indexable returning HWC float32 tiles.
        batch_size: tiles per batch (= accum_steps × micro_batch for train).
        shuffle: reshuffle each epoch (seeded, deterministic).
        drop_last: drop the trailing partial batch (train default — keeps
            shapes static for jit, reference dataloader.py:58-66).
        prefetch: number of batches to stage in a background thread.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        pad_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.pad_last = pad_last
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100_003 + self.epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _make_batch(self, idxs: np.ndarray):
        tiles = [self.dataset[int(i)] for i in idxs]
        batch = np.stack(tiles, axis=0)
        if self.pad_last:
            # Pad to the static batch shape (repeating the first tile) and
            # yield (batch, true_count): the eval step masks the padding,
            # so the trailing batch reuses the one compiled executable.
            count = batch.shape[0]
            if count < self.batch_size:
                pad = np.repeat(batch[:1], self.batch_size - count, axis=0)
                batch = np.concatenate([batch, pad], axis=0)
            return batch, count
        return batch

    def __iter__(self) -> Iterator[np.ndarray]:
        indices = self._indices()
        n_batches = len(self)
        self.epoch += 1

        if self.prefetch <= 0:
            for b in range(n_batches):
                yield self._make_batch(indices[b * self.batch_size : (b + 1) * self.batch_size])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # Bounded put that gives up when the consumer is gone — a
            # plain q.put would block forever if the iterator is
            # abandoned mid-epoch (e.g. `next(iter(loader))`), pinning
            # the thread and its staged batches for the process lifetime.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in range(n_batches):
                    batch = self._make_batch(
                        indices[b * self.batch_size : (b + 1) * self.batch_size]
                    )
                    if not _put(batch):
                        return
            except BaseException as e:  # surfaced to the consumer, not dropped
                _put((sentinel, e))
            finally:
                _put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, tuple) and len(item) == 2 and item[0] is sentinel:
                    # A silently-truncated epoch would skew training/eval;
                    # re-raise the worker's error in the consumer instead.
                    raise item[1]
                yield item
            t.join()
        finally:
            stop.set()


class DeviceCachedLoader(BatchLoader):
    """Batch loader whose tile set lives in device memory (HBM).

    On relayed TPU transports the per-step host→device batch upload is
    the training bottleneck, not compute: a 64×(64,64,13) fp32 batch is
    ~13.6 MB/step through the relay (~0.7-0.9 s) against a ~0.19 s
    device step. This loader uploads the WHOLE tile set once
    (512 tiles ≈ 109 MB, 4096 ≈ 872 MB — small next to the ~1.5 GB
    train state) and yields device-resident batches gathered by index;
    the host ships only a ~256-byte index vector per step.

    Semantics are bit-identical to :class:`BatchLoader` with the same
    arguments: same seeded permutation per epoch, same batch boundaries,
    same trailing-batch pad rule (``pad_last`` repeats the batch's first
    tile — here by repeating its index before the gather, so shapes stay
    static for jit). No prefetch threads: the "read" is a device gather.

    Multi-host note: each process caches its own dataset copy; pair with
    per-host dataset shards when feeding a multi-process mesh.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        pad_last: bool = False,
        sharding=None,
        storage_dtype: str = "native",
        max_bytes: Optional[int] = None,
    ):
        super().__init__(
            dataset, batch_size, shuffle=shuffle, drop_last=drop_last,
            seed=seed, prefetch=0, pad_last=pad_last,
        )
        import jax

        stacked = np.stack([dataset[i] for i in range(len(dataset))], axis=0)
        # Optional narrow storage: real Sentinel-2 DN tiles are integral
        # 0-10000 (often decoded to fp32) — storing them uint16 is EXACT
        # (normalize_raw casts to fp32 on device) and halves both the
        # one-time upload and HBM residency. "auto" narrows only when the
        # integral-and-in-range check proves exactness; "uint16" asserts it.
        if storage_dtype not in ("native", "auto", "uint16"):
            raise ValueError(f"storage_dtype must be native/auto/uint16, "
                             f"got {storage_dtype!r}")
        if (storage_dtype in ("auto", "uint16")
                and np.issubdtype(stacked.dtype, np.floating)):
            exact = (
                stacked.min() >= 0 and stacked.max() <= np.iinfo(np.uint16).max
                and not np.any(stacked != np.floor(stacked))
            )
            if exact:
                stacked = stacked.astype(np.uint16)
            elif storage_dtype == "uint16":
                raise ValueError(
                    "device_cache_dtype: uint16 requires integral tiles in "
                    "[0, 65535]; this dataset has fractional or out-of-range "
                    "values — use 'native' (or 'auto' to narrow only when "
                    "exact)")
        # The pre-build fit check (`_tile_nbytes`) sizes the cache from the
        # FIRST tile only; re-validate against the cap with the actual
        # post-narrowing size before committing HBM (a mixed integral/
        # fractional set stays fp32, 2x the estimate).
        if max_bytes is not None and stacked.nbytes > max_bytes:
            raise DeviceCacheTooLarge(
                f"tile set is {stacked.nbytes / 1e9:.2f} GB after dtype "
                f"resolution (> {max_bytes / 1e9:.2f} GB budget)")
        self.nbytes = stacked.nbytes
        self._tiles = jax.device_put(stacked, sharding)

    def _make_batch(self, idxs: np.ndarray):
        import jax.numpy as jnp

        count = len(idxs)
        if self.pad_last and count < self.batch_size:
            # Same pad rule as BatchLoader: repeat the batch's first tile.
            idxs = np.concatenate(
                [idxs, np.repeat(idxs[:1], self.batch_size - count)]
            )
        batch = jnp.take(self._tiles, jnp.asarray(idxs, jnp.int32), axis=0)
        if self.pad_last:
            return batch, count
        return batch


def _device_cache_enabled(config: dict, nbytes_estimate: int) -> bool:
    """Resolve data.device_cache: true/false/'auto' (auto = fit check only)."""
    import logging

    data_cfg = config.get("data", {})
    mode = data_cfg.get("device_cache", False)
    if mode is False:
        return False
    cap_gb = float(data_cfg.get("device_cache_max_gb", 4.0))
    fits = nbytes_estimate <= cap_gb * 1e9
    if not fits and mode is True:
        logging.getLogger(__name__).warning(
            "data.device_cache: true but the tile set is %.2f GB "
            "(> device_cache_max_gb %.1f) — falling back to the host "
            "loader", nbytes_estimate / 1e9, cap_gb)
    return fits


def _tile_nbytes(dataset, storage_dtype: str = "native") -> int:
    """Estimated device-cache bytes for ``dataset``.

    When ``storage_dtype`` is auto/uint16 and the first tile is integral
    fp32 in uint16 range, the cache will narrow to uint16 — estimate the
    POST-narrowing size so a dataset that fits only after narrowing is
    not rejected by the ``device_cache_max_gb`` check. (First-tile
    heuristic: exactness AND the actual fit are re-verified at build time
    by :class:`DeviceCachedLoader` — a mixed set that stays fp32 falls
    back to the host loader via :class:`DeviceCacheTooLarge` rather than
    overshooting the budget.)
    """
    if len(dataset) == 0:
        return 0
    tile = np.asarray(dataset[0])
    nbytes = tile.nbytes
    if (storage_dtype in ("auto", "uint16")
            and np.issubdtype(tile.dtype, np.floating)
            and tile.itemsize == 4
            and tile.size > 0
            and tile.min() >= 0 and tile.max() <= np.iinfo(np.uint16).max
            and not np.any(tile != np.floor(tile))):
        nbytes //= 2
    return nbytes * len(dataset)


def _device_cached_or_host(dataset, **kw):
    """DeviceCachedLoader when possible, host BatchLoader otherwise (empty
    split — nothing to stack — or actual post-narrowing size over budget)."""
    import logging

    storage = kw.pop("storage_dtype", "native")
    max_bytes = kw.pop("max_bytes", None)
    if len(dataset) > 0:
        try:
            return DeviceCachedLoader(
                dataset, storage_dtype=storage, max_bytes=max_bytes, **kw)
        except DeviceCacheTooLarge as e:
            logging.getLogger(__name__).warning(
                "device cache disabled for this split: %s — using the host "
                "loader", e)
    kw.pop("sharding", None)
    return BatchLoader(dataset, **kw)


def get_dataloaders(config: dict):
    """(train_loader, val_loader) from config — reference dataloader.py:18-84
    surface. Train batch = accum_steps × micro_batch (the jitted step scans
    the accumulation axis on device)."""
    from msid_tpu.data.dataset import build_dataset

    training = config.get("training", {})
    micro = int(training.get("micro_batch_size", 8))
    accum = int(training.get("gradient_accumulation_steps", 1))
    seed = int(config.get("seed", 42))

    train_ds = build_dataset(config, "train")
    val_ds = build_dataset(config, "val")
    storage = config.get("data", {}).get("device_cache_dtype", "auto")
    if _device_cache_enabled(
            config,
            _tile_nbytes(train_ds, storage) + _tile_nbytes(val_ds, storage)):
        cap = int(float(
            config.get("data", {}).get("device_cache_max_gb", 4.0)) * 1e9)
        train_loader = _device_cached_or_host(
            train_ds, batch_size=micro * accum, shuffle=True,
            drop_last=True, seed=seed, storage_dtype=storage, max_bytes=cap,
        )
        spent = getattr(train_loader, "nbytes", 0)
        val_loader = _device_cached_or_host(
            val_ds, batch_size=micro * accum, shuffle=False,
            drop_last=False, seed=seed, pad_last=True,
            storage_dtype=storage, max_bytes=max(0, cap - spent),
        )
        return train_loader, val_loader
    train_loader = BatchLoader(
        train_ds, batch_size=micro * accum, shuffle=True, drop_last=True, seed=seed
    )
    # Validation keeps EVERY sample (reference dataloader.py:68-74 uses no
    # drop_last): dropping the trailing partial batch would silently
    # exclude up to batch-1 samples — and yield ZERO val batches (all-zero
    # metrics, broken best-checkpoint ranking) when the val split is
    # smaller than a batch. pad_last pads it to the static batch shape
    # with a (batch, true_count) tuple; the eval step masks the padding,
    # so every val-set size costs exactly one eval-step compile.
    val_loader = BatchLoader(
        val_ds, batch_size=micro * accum, shuffle=False, drop_last=False,
        seed=seed, pad_last=True,
    )
    return train_loader, val_loader


def get_test_dataloader(config: dict, batch_size: Optional[int] = None):
    """Full-split loader without corruption keys (reference dataloader.py:86-121)."""
    from msid_tpu.data.dataset import build_dataset

    cfg = dict(config)
    cfg["data"] = dict(config.get("data", {}), train_split=1.0)
    ds = build_dataset(cfg, "train")
    bs = batch_size or int(config.get("training", {}).get("micro_batch_size", 8))
    # pad_last: the eval loop masks padded samples via the true count, so
    # the trailing batch is unbiased AND reuses the one compiled shape.
    storage = config.get("data", {}).get("device_cache_dtype", "auto")
    if len(ds) > 0 and _device_cache_enabled(config, _tile_nbytes(ds, storage)):
        cap = int(float(
            config.get("data", {}).get("device_cache_max_gb", 4.0)) * 1e9)
        return _device_cached_or_host(
            ds, batch_size=bs, shuffle=False, drop_last=False, pad_last=True,
            storage_dtype=storage, max_bytes=cap,
        )
    return BatchLoader(ds, batch_size=bs, shuffle=False, drop_last=False,
                       pad_last=True)
