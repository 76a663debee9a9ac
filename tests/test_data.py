"""Data layer: TIFF round-trip, split parity, synthetic dataset, loader."""

import numpy as np
import pytest

from msid_tpu.data import (
    BatchLoader,
    EuroSATMultiSpectral,
    SyntheticEuroSAT,
    read_tiff,
    write_tiff,
)
from msid_tpu.data.dataset import _reference_split


def test_tiff_roundtrip_uint16(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 10000, size=(64, 64, 13), dtype=np.uint16)
    p = tmp_path / "tile.tif"
    write_tiff(p, img)
    back = read_tiff(p)
    assert back.shape == (64, 64, 13)
    assert back.dtype == np.uint16
    assert np.array_equal(back, img)


def test_tiff_roundtrip_float32(tmp_path):
    img = np.random.default_rng(1).normal(size=(32, 16, 3)).astype(np.float32)
    p = tmp_path / "f.tif"
    write_tiff(p, img)
    assert np.allclose(read_tiff(p), img)


def test_tiff_matches_pil(tmp_path):
    """Cross-check our reader against PIL on a PIL-written file."""
    PIL = pytest.importorskip("PIL.Image")
    img = np.random.default_rng(2).integers(0, 255, (40, 56), dtype=np.uint8)
    p = tmp_path / "gray.tif"
    PIL.fromarray(img).save(p)
    back = read_tiff(p)
    assert np.array_equal(back.squeeze(-1), img)


def test_split_matches_reference_semantics():
    """np.random.seed + permutation, 80/20 — identical index sets."""
    train, val = _reference_split(100, 0.8, 42)
    np.random.seed(42)
    want = np.random.permutation(100)
    assert np.array_equal(train, want[:80])
    assert np.array_equal(val, want[80:])
    assert len(set(train) & set(val)) == 0


def test_dataset_glob_split_and_band_padding(tmp_path):
    rng = np.random.default_rng(3)
    for sub in ("AnnualCrop", "Forest"):
        d = tmp_path / sub
        d.mkdir()
        for i in range(5):
            write_tiff(d / f"{sub}_{i}.tif", rng.integers(0, 10000, (64, 64, 13), dtype=np.uint16))
    # one tile with too few bands → padded
    write_tiff(tmp_path / "AnnualCrop" / "odd.tif", rng.integers(0, 10000, (64, 64, 4), dtype=np.uint16))

    train = EuroSATMultiSpectral(tmp_path, split="train", train_split=0.8, seed=42)
    val = EuroSATMultiSpectral(tmp_path, split="val", train_split=0.8, seed=42)
    assert len(train) + len(val) == 11
    for ds in (train, val):
        for i in range(len(ds)):
            tile = ds[i]
            assert tile.shape == (64, 64, 13)
            assert tile.dtype == np.float32


def test_synthetic_dataset_deterministic():
    ds = SyntheticEuroSAT(num_samples=20, split="train", seed=7)
    a, b = ds[0], ds[0]
    assert np.array_equal(a, b)
    assert a.shape == (64, 64, 13)
    assert 0 <= a.min() and a.max() <= 10000
    ds2 = SyntheticEuroSAT(num_samples=20, split="train", seed=8)
    assert not np.array_equal(ds[0], ds2[0])


def test_synthetic_rich_tiles():
    rich = SyntheticEuroSAT(num_samples=20, split="train", seed=7,
                            complexity="rich")
    a = rich[0]
    assert np.array_equal(a, rich[0])  # deterministic per (seed, index)
    assert a.shape == (64, 64, 13) and a.dtype == np.float32
    assert 0 <= a.min() and a.max() <= 10000
    base = SyntheticEuroSAT(num_samples=20, split="train", seed=7)
    assert not np.array_equal(a, base[0])
    # class-segmentation structure: rich tiles have markedly heavier
    # strong-edge tails than one smooth field with texture
    def edge_q99(tile):
        g = np.abs(np.diff(tile[..., 3] / 10000.0, axis=0))
        return np.quantile(g, 0.99)
    q_rich = np.mean([edge_q99(rich[i]) for i in range(8)])
    q_base = np.mean([edge_q99(base[i]) for i in range(8)])
    assert q_rich > q_base
    with pytest.raises(ValueError, match="complexity"):
        SyntheticEuroSAT(num_samples=4, complexity="extreme")


def test_batch_loader_shapes_and_determinism():
    ds = SyntheticEuroSAT(num_samples=50, split="train", seed=0)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    assert all(b.shape == (8, 64, 64, 13) for b in batches)
    # second epoch shuffles differently
    batches2 = list(loader)
    assert not np.array_equal(batches[0], batches2[0])
    # fresh loader with same seed reproduces epoch 0
    loader3 = BatchLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=1)
    assert np.array_equal(list(loader3)[0], batches[0])


def test_batch_loader_pad_last():
    ds = SyntheticEuroSAT(num_samples=12, split="train", train_split=1.0)
    loader = BatchLoader(ds, batch_size=8, shuffle=False, drop_last=False, pad_last=True)
    batches = list(loader)
    assert len(batches) == 2
    # pad_last yields (batch, true_count): static shape + mask count
    b0, n0 = batches[0]
    b1, n1 = batches[1]
    assert b0.shape == (8, 64, 64, 13) and n0 == 8
    assert b1.shape == (8, 64, 64, 13) and n1 == 4
    # padding repeats the first real tile of the trailing batch
    assert np.array_equal(b1[4], b1[0])


def test_build_dataset_synthetic_fallback(tmp_path):
    from msid_tpu.data import build_dataset

    cfg = {
        "seed": 42,
        "data": {"root_dir": str(tmp_path / "missing"), "synthetic_fallback": True,
                 "synthetic_samples": 16},
    }
    ds = build_dataset(cfg, "train")
    assert isinstance(ds, SyntheticEuroSAT)
    assert len(ds) > 0


def test_odd_sized_tile_normalized(tmp_path):
    """An odd-sized file must crop/pad to the static tile shape."""
    from msid_tpu.data.dataset import EuroSATMultiSpectral
    from msid_tpu.data.tiff import write_tiff

    rng = np.random.default_rng(0)
    d = tmp_path / "cls"
    d.mkdir()
    write_tiff(d / "big.tif", rng.integers(0, 100, (80, 70, 13), dtype=np.uint16))
    write_tiff(d / "small.tif", rng.integers(0, 100, (40, 64, 13), dtype=np.uint16))
    ds = EuroSATMultiSpectral(tmp_path, split="train", train_split=1.0)
    for i in range(len(ds)):
        assert ds[i].shape == (64, 64, 13)


def test_batch_loader_propagates_worker_errors():
    """A failing dataset item must raise in the consumer, not silently end
    the epoch early (a truncated epoch skews training/eval)."""

    class Broken:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            if i >= 8:
                raise RuntimeError("bad tile")
            return np.zeros((64, 64, 13), np.float32)

    loader = BatchLoader(Broken(), batch_size=8, shuffle=False, drop_last=True)
    with pytest.raises(RuntimeError, match="bad tile"):
        list(loader)


def test_batch_loader_partial_last_batch():
    ds = SyntheticEuroSAT(num_samples=12, split="train", train_split=1.0)
    loader = BatchLoader(ds, batch_size=8, shuffle=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].shape == (8, 64, 64, 13)
    assert batches[1].shape == (4, 64, 64, 13)  # true remainder, no padding


def test_batch_loader_survives_abandoned_iterator():
    """Abandoning the iterator (e.g. next(iter(loader))) must not leave the
    prefetch worker blocked forever on a full queue."""
    import threading

    ds = SyntheticEuroSAT(num_samples=64, split="train", train_split=1.0)
    loader = BatchLoader(ds, batch_size=8, shuffle=False, drop_last=True)
    before = threading.active_count()
    for _ in range(5):
        it = iter(loader)
        next(it)
        it.close()  # triggers GeneratorExit at the yield
    import time as _time

    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before + 1  # workers drained


def test_device_cached_loader_matches_host_loader():
    """DeviceCachedLoader must be bit-identical to BatchLoader across
    epochs: same seeded permutations, batch boundaries, and pad rule —
    only the residence (HBM gather vs host stack) differs."""
    from msid_tpu.data import DeviceCachedLoader

    ds = SyntheticEuroSAT(num_samples=50, split="train", seed=0)
    host = BatchLoader(ds, batch_size=8, shuffle=True, seed=3)
    dev = DeviceCachedLoader(ds, batch_size=8, shuffle=True, seed=3)
    assert len(host) == len(dev)
    for _ in range(2):  # two epochs: the reshuffle streams must track
        for hb, db in zip(host, dev):
            np.testing.assert_array_equal(hb, np.asarray(db))


def test_device_cached_loader_pad_last_parity():
    from msid_tpu.data import DeviceCachedLoader

    ds = SyntheticEuroSAT(num_samples=12, split="train", train_split=1.0)
    host = BatchLoader(ds, batch_size=8, shuffle=False, drop_last=False,
                       pad_last=True)
    dev = DeviceCachedLoader(ds, batch_size=8, shuffle=False, drop_last=False,
                             pad_last=True)
    for (hb, hc), (db, dc) in zip(host, dev):
        assert hc == dc
        np.testing.assert_array_equal(hb, np.asarray(db))


def test_get_dataloaders_device_cache_config():
    from msid_tpu.data import DeviceCachedLoader, get_dataloaders

    base = {
        "data": {"root_dir": "/nonexistent-forces-synthetic",
                 "device_cache": True},
        "training": {"micro_batch_size": 4, "gradient_accumulation_steps": 1},
        "seed": 11,
    }
    train_loader, val_loader = get_dataloaders(base)
    assert isinstance(train_loader, DeviceCachedLoader)
    assert isinstance(val_loader, DeviceCachedLoader)
    batch = next(iter(train_loader))
    assert batch.shape[1:] == (64, 64, 13)

    # same config through the host path: identical batches
    host_cfg = dict(base, data=dict(base["data"], device_cache=False))
    h_train, _ = get_dataloaders(host_cfg)
    np.testing.assert_array_equal(next(iter(h_train)), np.asarray(batch))

    # over-cap falls back to the host loader (with a warning), even
    # when device_cache is explicitly true
    small_cap = dict(base, data=dict(base["data"], device_cache_max_gb=1e-9))
    c_train, c_val = get_dataloaders(small_cap)
    assert not isinstance(c_train, DeviceCachedLoader)
    assert not isinstance(c_val, DeviceCachedLoader)


def test_device_cache_uint16_storage():
    """'auto' narrows integral fp32 tiles to uint16 storage (exact by
    construction), yields value-identical batches, and 'uint16' on
    fractional data fails loudly."""
    from msid_tpu.data import DeviceCachedLoader

    class IntegralTiles:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return rng.integers(0, 10000, (8, 8, 13)).astype(np.float32)

    ds = IntegralTiles()
    auto = DeviceCachedLoader(ds, batch_size=5, shuffle=False,
                              storage_dtype="auto")
    assert auto._tiles.dtype == np.uint16
    assert auto.nbytes == 10 * 8 * 8 * 13 * 2
    native = DeviceCachedLoader(ds, batch_size=5, shuffle=False,
                                storage_dtype="native")
    for ab, nb in zip(auto, native):
        np.testing.assert_array_equal(np.asarray(ab, np.float32),
                                      np.asarray(nb))

    frac = SyntheticEuroSAT(num_samples=8, split="train", train_split=1.0)
    fr = DeviceCachedLoader(frac, batch_size=4, shuffle=False,
                            storage_dtype="auto")
    assert fr._tiles.dtype == np.float32  # auto keeps fractional data wide
    with pytest.raises(ValueError, match="integral"):
        DeviceCachedLoader(frac, batch_size=4, shuffle=False,
                           storage_dtype="uint16")


def test_device_cache_empty_split_falls_back_to_host_loader():
    """An empty split can't be stacked into a device cache: get_dataloaders
    must hand back a host BatchLoader for it (empty epoch) instead of
    crashing in np.stack (ADVICE r2)."""
    from msid_tpu.data import DeviceCachedLoader, get_dataloaders

    cfg = {
        "data": {"root_dir": "/nonexistent-forces-synthetic",
                 "device_cache": True, "synthetic_samples": 4,
                 "train_split": 1.0},  # val split is empty
        "training": {"micro_batch_size": 2, "gradient_accumulation_steps": 1},
        "seed": 7,
    }
    train_loader, val_loader = get_dataloaders(cfg)
    assert isinstance(train_loader, DeviceCachedLoader)
    assert not isinstance(val_loader, DeviceCachedLoader)
    assert list(iter(val_loader)) == []  # graceful empty epoch


def test_tile_nbytes_estimates_post_narrowing_size():
    """The device_cache_max_gb fit check must use post-uint16-narrowing
    bytes for integral fp32 tiles (ADVICE r2): a dataset that fits only
    after narrowing should still enable the cache."""
    from msid_tpu.data.pipeline import _tile_nbytes

    class IntegralTiles:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return rng.integers(0, 10000, (8, 8, 13)).astype(np.float32)

    ds = IntegralTiles()
    full = 10 * 8 * 8 * 13 * 4
    assert _tile_nbytes(ds, "native") == full
    assert _tile_nbytes(ds, "auto") == full // 2
    assert _tile_nbytes(ds, "uint16") == full // 2
    # fractional data never narrows
    frac = SyntheticEuroSAT(num_samples=4, split="train", train_split=1.0)
    one = np.asarray(frac[0]).nbytes
    assert _tile_nbytes(frac, "auto") == one * len(frac)


def test_device_cache_budget_revalidated_after_narrowing():
    """_tile_nbytes halves the estimate from the FIRST tile; a mixed set
    whose later tiles are fractional stays fp32 (2x the estimate), so the
    loader must re-check the budget post-stacking and callers must fall
    back to the host loader instead of overshooting HBM."""
    from msid_tpu.data.pipeline import (
        DeviceCachedLoader,
        DeviceCacheTooLarge,
        _device_cached_or_host,
        _tile_nbytes,
    )

    class MixedTiles:
        # tile 0 integral (narrowing looks possible), the rest fractional
        def __len__(self):
            return 6

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            t = rng.integers(0, 10000, (8, 8, 13)).astype(np.float32)
            return t if i == 0 else t + 0.5

    ds = MixedTiles()
    full = 6 * 8 * 8 * 13 * 4
    assert _tile_nbytes(ds, "auto") == full // 2  # first-tile heuristic
    # A cap between the estimate and the true size: the loader refuses…
    with pytest.raises(DeviceCacheTooLarge):
        DeviceCachedLoader(ds, batch_size=2, storage_dtype="auto",
                           max_bytes=full // 2)
    # …and the get_dataloaders helper falls back to the host loader.
    loader = _device_cached_or_host(ds, batch_size=2, storage_dtype="auto",
                                    max_bytes=full // 2)
    assert not isinstance(loader, DeviceCachedLoader)
    # With an honest budget the cache builds (fp32, full size).
    ok = DeviceCachedLoader(ds, batch_size=2, storage_dtype="auto",
                            max_bytes=full)
    assert ok.nbytes == full


def test_synthetic_mixed_tiles_match_pure_families():
    """'mixed' draws each tile from base or rich by a seeded per-index
    coin, and every mixed tile is bit-identical to the same-index tile of
    its pure family (so cross-domain comparisons are exact)."""
    n, seed = 40, 7
    mixed = SyntheticEuroSAT(num_samples=n, split="train", seed=seed,
                             train_split=1.0, complexity="mixed")
    base = SyntheticEuroSAT(num_samples=n, split="train", seed=seed,
                            train_split=1.0, complexity="base")
    rich = SyntheticEuroSAT(num_samples=n, split="train", seed=seed,
                            train_split=1.0, complexity="rich")
    n_base = n_rich = 0
    for i in range(n):
        m = mixed[i]
        if np.array_equal(m, base[i]):
            n_base += 1
        elif np.array_equal(m, rich[i]):
            n_rich += 1
        else:
            raise AssertionError(f"mixed tile {i} matches neither family")
    # both families present, roughly balanced (p=0.5, n=40)
    assert n_base + n_rich == n
    assert 10 <= n_base <= 30
