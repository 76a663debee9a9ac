"""EuroSAT multi-spectral dataset: host-side tile loading + split.

Capability parity with the reference loader
(`/root/reference/src/data/dataset.py:29-240`) with one deliberate
architectural difference: the host stops at **raw HWC tiles**
(64×64×13). Range normalization, the 64→192 bilinear upsample, the
[-2, 2] affine, and the sensor corruption all run on device inside the
jitted step (see `msid_tpu.ops.preprocess` / `msid_tpu.ops.noise`) — 9×
less host→device traffic and zero host preprocessing in the hot loop.

Matching reference semantics:
  * recursive ``*.tif`` glob with ``*.jpg``/``*.png`` fallback
    (dataset.py:87-95);
  * deterministic seeded 80/20 permutation split — **identical indices**
    to the reference for the same seed (it uses
    ``np.random.seed(seed); np.random.permutation(n)``, dataset.py:100-108);
  * pad/truncate to 13 bands (dataset.py:151-158);
  * grayscale→13-band replication for non-TIFF images (dataset.py:137-148);
  * unreadable samples → zero tiles (dataset.py:131-134).

Plus a synthetic procedural dataset for tests/benchmarks when no data is
on disk.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from msid_tpu.data.tiff import read_tiff

logger = logging.getLogger(__name__)

NUM_BANDS = 13
TILE_SIZE = 64


def _reference_split(n: int, train_split: float, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Bit-identical to the reference's split (dataset.py:100-108)."""
    rng_state = np.random.get_state()
    np.random.seed(seed)
    indices = np.random.permutation(n)
    np.random.set_state(rng_state)
    split_idx = int(train_split * n)
    return indices[:split_idx], indices[split_idx:]


class EuroSATMultiSpectral:
    """Indexable host-side dataset returning raw HWC float32 tiles."""

    def __init__(
        self,
        root_dir: str | Path,
        split: str = "train",
        train_split: float = 0.8,
        seed: int = 42,
        num_bands: int = NUM_BANDS,
        tile_size: int = TILE_SIZE,
    ):
        self.root_dir = Path(root_dir)
        self.num_bands = num_bands
        self.tile_size = tile_size

        samples = sorted(self.root_dir.rglob("*.tif"))
        if not samples:
            samples = sorted(
                list(self.root_dir.rglob("*.jpg")) + list(self.root_dir.rglob("*.png"))
            )
        if not samples:
            raise FileNotFoundError(f"No image tiles found under {self.root_dir}")

        train_idx, val_idx = _reference_split(len(samples), train_split, seed)
        if split == "train":
            self.samples: List[Path] = [samples[i] for i in train_idx]
        elif split == "val":
            self.samples = [samples[i] for i in val_idx]
        else:
            raise ValueError(f"Invalid split: {split}. Use 'train' or 'val'")
        logger.info("%s split: %d samples", split.upper(), len(self.samples))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> np.ndarray:
        """Raw HWC float32 tile [tile, tile, num_bands] (un-normalized)."""
        path = self.samples[idx]
        try:
            if path.suffix.lower() in (".tif", ".tiff"):
                img = read_tiff(path).astype(np.float32)
            else:
                from PIL import Image

                gray = np.asarray(Image.open(path).convert("L"), dtype=np.float32)
                img = np.repeat(gray[:, :, None], self.num_bands, axis=2)
        except Exception as e:  # unreadable → zeros (reference behavior)
            logger.error("Error reading %s: %s", path, e)
            return np.zeros((self.tile_size, self.tile_size, self.num_bands), np.float32)

        if img.ndim == 2:
            img = img[:, :, None]
        c = img.shape[2]
        if c < self.num_bands:
            pad = np.zeros((*img.shape[:2], self.num_bands - c), img.dtype)
            img = np.concatenate([img, pad], axis=2)
        elif c > self.num_bands:
            img = img[:, :, : self.num_bands]
        # Spatial guard: batches stack to a static [tile, tile] shape, so
        # an odd-sized file must not poison the pipeline — crop/zero-pad.
        h, w = img.shape[:2]
        t = self.tile_size
        if (h, w) != (t, t):
            img = img[:t, :t]
            if img.shape[0] < t or img.shape[1] < t:
                padded = np.zeros((t, t, self.num_bands), img.dtype)
                padded[: img.shape[0], : img.shape[1]] = img
                img = padded
        return np.ascontiguousarray(img, dtype=np.float32)

    def compute_statistics(self, num_samples: int = 1000) -> dict:
        """Per-band mean/std over up to num_samples tiles (dataset.py:196-240)."""
        n = min(num_samples, len(self))
        mean = np.zeros(self.num_bands, np.float64)
        std = np.zeros(self.num_bands, np.float64)
        count = 0
        for i in range(n):
            img = self[i]
            mean += img.mean(axis=(0, 1))
            std += img.std(axis=(0, 1))
            count += 1
        if count == 0:
            raise ValueError("No valid samples for statistics")
        return {"mean": mean / count, "std": std / count}


class SyntheticEuroSAT:
    """Procedural stand-in dataset: smooth correlated multi-band fields.

    Deterministic per (seed, index); spectral bands are correlated low-pass
    random fields scaled into the Sentinel-2 DN range so the full
    normalize→corrupt→restore path exercises realistically.
    """

    def __init__(
        self,
        num_samples: int = 512,
        split: str = "train",
        train_split: float = 0.8,
        seed: int = 42,
        num_bands: int = NUM_BANDS,
        tile_size: int = TILE_SIZE,
        complexity: str = "base",
    ):
        if complexity not in ("base", "rich", "mixed"):
            raise ValueError(f"unknown synthetic complexity {complexity!r}")
        self.num_bands = num_bands
        self.tile_size = tile_size
        self.seed = seed
        self.complexity = complexity
        train_idx, val_idx = _reference_split(num_samples, train_split, seed)
        self.indices = train_idx if split == "train" else val_idx
        # tiles are deterministic per (seed, index) and small (~213 KB);
        # cache so repeated epochs don't regenerate (~10 ms/tile was the
        # per-epoch bottleneck once the device step hit ~190 ms/batch-64)
        self._cache: dict = {}

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int) -> np.ndarray:
        cached = self._cache.get(idx)
        if cached is not None:
            return cached
        tile = self._generate(int(self.indices[idx]))
        self._cache[idx] = tile
        return tile

    @staticmethod
    def _smooth_field(rng, t: int, cell: int) -> np.ndarray:
        """Random coarse grid, nearest-upsampled then box-smoothed, in [0,1]."""
        coarse = rng.normal(size=(max(t // cell, 1), max(t // cell, 1)))
        field = np.kron(coarse, np.ones((cell, cell)))[:t, :t]
        for axis in (0, 1):
            field = (np.roll(field, 1, axis) + field + np.roll(field, -1, axis)) / 3.0
        return (field - field.min()) / (np.ptp(field) + 1e-9)

    def _generate(self, gidx: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 1_000_003 + gidx)
        t = self.tile_size
        family = self.complexity
        if family == "mixed":
            # Mixed-domain training (round-3 cross-domain study): a seeded
            # per-index coin picks the family, on a SEPARATE rng stream so
            # each mixed tile is bit-identical to the same-index tile of
            # its pure family — cross-domain comparisons stay exact.
            coin = np.random.default_rng(self.seed * 7_777_777 + gidx)
            family = "rich" if coin.uniform() < 0.5 else "base"
        if family == "rich":
            return self._generate_rich(rng, t)
        # low-frequency base field: random coarse grid, bilinear-upsampled
        base = self._smooth_field(rng, t, 8)
        # per-band gain/offset with spectral correlation + band-specific texture
        bands = []
        for b in range(self.num_bands):
            gain = 0.6 + 0.4 * np.sin(0.5 * b + rng.uniform(0, 0.3))
            texture = rng.normal(scale=0.03, size=(t, t))
            band = np.clip(base * gain + texture + 0.1, 0, 1)
            bands.append(band)
        img = np.stack(bands, axis=-1) * 10000.0  # Sentinel-2 DN range
        return img.astype(np.float32)

    def _generate_rich(self, rng, t: int) -> np.ndarray:
        """EuroSAT-like procedural tile: land-cover-style segments with
        distinct spectral signatures + multi-octave texture.

        Why: the 'base' tiles are one smooth field with per-band gains —
        a denoiser saturates on them near 35.5 dB (round-1 600-epoch
        ceiling). Rich tiles add (a) segmentation structure (thresholded
        smooth field → 2-4 'classes', each with its own smooth per-band
        signature, like fields/forest/water patches in EuroSAT), (b)
        three octaves of spatial detail, (c) cross-band-correlated
        high-frequency texture — so restoration must exploit spatial
        edges AND spectral correlation, as on the real data.
        """
        c = self.num_bands
        # (a) class segmentation from a smooth field
        num_classes = int(rng.integers(2, 5))
        seg_field = self._smooth_field(rng, t, 16)
        thresholds = np.sort(rng.uniform(0.2, 0.8, num_classes - 1))
        seg = np.digitize(seg_field, thresholds)  # [t, t] in 0..K-1

        # per-class smooth spectral signature: low-order cosine mixture
        # over the band index (bands of one class move together)
        band_idx = np.arange(c)
        signatures = np.stack([
            0.35 + 0.3 * rng.uniform()
            + 0.25 * np.cos(band_idx * rng.uniform(0.2, 0.9) + rng.uniform(0, np.pi))
            + 0.1 * np.cos(band_idx * rng.uniform(1.0, 2.2) + rng.uniform(0, np.pi))
            for _ in range(num_classes)
        ])  # [K, C]

        # (b) multi-octave modulation shared across bands
        octaves = (
            0.50 * self._smooth_field(rng, t, 16)
            + 0.30 * self._smooth_field(rng, t, 8)
            + 0.20 * self._smooth_field(rng, t, 4)
        )
        # (c) cross-band-correlated texture: one shared hi-freq field,
        # per-band scaling, plus a little independent per-band noise
        shared_tex = rng.normal(scale=1.0, size=(t, t))
        band_tex_gain = rng.uniform(0.01, 0.05, c)

        img = signatures[seg]  # [t, t, C] class signature per pixel
        img = img * (0.6 + 0.55 * octaves[..., None])
        img += shared_tex[..., None] * band_tex_gain
        img += rng.normal(scale=0.01, size=(t, t, c))
        img = np.clip(img, 0.0, 1.0) * 10000.0  # Sentinel-2 DN range
        return img.astype(np.float32)


def build_dataset(config: dict, split: str):
    """Dataset factory honoring `data.synthetic_fallback`."""
    data_cfg = config.get("data", {})
    root = Path(data_cfg.get("root_dir", "./data/EuroSAT_MS"))
    kwargs = dict(
        train_split=float(data_cfg.get("train_split", 0.8)),
        seed=int(config.get("seed", 42)),
        num_bands=int(data_cfg.get("num_bands", NUM_BANDS)),
    )
    try:
        return EuroSATMultiSpectral(root, split=split, **kwargs)
    except FileNotFoundError:
        if data_cfg.get("synthetic_fallback", True):
            logger.warning("Dataset not found at %s — using synthetic tiles", root)
            n = int(data_cfg.get("synthetic_samples", 512))
            return SyntheticEuroSAT(
                n, split=split,
                complexity=str(data_cfg.get("synthetic_complexity", "base")),
                **kwargs,
            )
        raise
