"""Sensor-noise simulator property tests vs reference semantics
(transforms.py:70-154): component variances, dead-band kill rate,
clamp range, determinism, and preprocessing parity vs torch bilinear."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msid_tpu.ops.noise import NoiseConfig, apply_sensor_noise
from msid_tpu.ops.preprocess import (
    from_model_range,
    normalize_raw,
    preprocess_tiles,
    to_model_range,
)


def _key(i=0):
    return jax.random.PRNGKey(i)


def test_gaussian_only_variance():
    cfg = NoiseConfig(gaussian_sigma=0.1, speckle_sigma=0.0, dead_band_prob=0.0, thermal_scale=0.0)
    x = jnp.zeros((8, 32, 32, 13))
    y = apply_sensor_noise(_key(), x, cfg)
    assert np.std(np.asarray(y)) == pytest.approx(0.1, rel=0.05)


def test_speckle_multiplicative():
    cfg = NoiseConfig(gaussian_sigma=0.0, speckle_sigma=0.05, dead_band_prob=0.0, thermal_scale=0.0)
    x = jnp.full((8, 32, 32, 13), 2.0)
    y = apply_sensor_noise(_key(), x, cfg)
    # x * (1 + N(0, 0.05)) → mean 2, std 2*0.05
    assert np.mean(np.asarray(y)) == pytest.approx(2.0, abs=0.01)
    assert np.std(np.asarray(y)) == pytest.approx(0.1, rel=0.05)
    # zero input stays exactly zero under pure speckle
    z = apply_sensor_noise(_key(1), jnp.zeros_like(x), cfg)
    assert np.all(np.asarray(z) == 0.0)


def test_dead_band_rate_and_whole_channel_kill():
    cfg = NoiseConfig(gaussian_sigma=0.0, speckle_sigma=0.0, dead_band_prob=0.25, thermal_scale=0.0)
    x = jnp.ones((64, 16, 16, 13))
    y = np.asarray(apply_sensor_noise(_key(), x, cfg))
    channel_dead = np.all(y == 0.0, axis=(1, 2))  # [B, C]
    channel_alive = np.all(y == 1.0, axis=(1, 2))
    # every channel is either fully dead or fully alive
    assert np.all(channel_dead | channel_alive)
    rate = channel_dead.mean()
    assert rate == pytest.approx(0.25, abs=0.05)


def test_thermal_wavelength_weighting():
    cfg = NoiseConfig(gaussian_sigma=0.0, speckle_sigma=0.0, dead_band_prob=0.0, thermal_scale=0.1)
    x = jnp.zeros((32, 32, 32, 13))
    y = np.asarray(apply_sensor_noise(_key(), x, cfg))
    stds = y.std(axis=(0, 1, 2))  # per-band
    # linspace(1,2,13): band 0 → 0.1, band 12 → 0.2
    assert stds[0] == pytest.approx(0.1, rel=0.1)
    assert stds[12] == pytest.approx(0.2, rel=0.1)
    assert np.all(np.diff(stds) > -0.01)  # monotone up the spectrum


def test_striping_column_structure():
    cfg = NoiseConfig(
        gaussian_sigma=0.0, speckle_sigma=0.0, dead_band_prob=0.0, thermal_scale=0.0,
        enable_striping=True, stripe_prob=1.0, stripe_sigma=0.02,
    )
    x = jnp.zeros((4, 32, 32, 13))
    y = np.asarray(apply_sensor_noise(_key(), x, cfg))
    # stripes are constant down each column
    assert np.allclose(y, y[:, :1, :, :])
    assert y.std() > 0


def test_clamp_range():
    cfg = NoiseConfig(gaussian_sigma=2.0)
    x = jnp.full((4, 16, 16, 13), 2.5)
    y = np.asarray(apply_sensor_noise(_key(), x, cfg))
    assert y.max() <= 3.0 and y.min() >= -3.0


def test_determinism_and_key_sensitivity():
    cfg = NoiseConfig()
    x = jnp.ones((2, 16, 16, 13))
    a = apply_sensor_noise(_key(7), x, cfg)
    b = apply_sensor_noise(_key(7), x, cfg)
    c = apply_sensor_noise(_key(8), x, cfg)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_zero_config_is_identity():
    cfg = NoiseConfig(0.0, 0.0, 0.0, 0.0, False)
    x = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (2, 8, 8, 13)).astype(np.float32))
    y = apply_sensor_noise(_key(), x, cfg)
    assert np.allclose(np.asarray(y), np.asarray(x))


# ---------------- preprocessing ----------------


def test_normalize_raw_heuristics():
    raw = jnp.full((1, 4, 4, 13), 5000.0)  # Sentinel-2 DN
    assert float(normalize_raw(raw).max()) == pytest.approx(0.5)
    # reference heuristic: max>10 → /10000 first, so the /255 branch only
    # triggers for 1.5 < max <= 10 (dataset.py:162-165)
    eight_bit_ish = jnp.full((1, 4, 4, 13), 5.0)
    assert float(normalize_raw(eight_bit_ish).max()) == pytest.approx(5 / 255)
    unit = jnp.full((1, 4, 4, 13), 0.5)
    assert float(normalize_raw(unit).max()) == pytest.approx(0.5)
    # the heuristic is per SAMPLE (reference normalizes in __getitem__):
    # a mixed-scale batch must not share one scale
    mixed = jnp.concatenate([raw, unit], axis=0)
    out = normalize_raw(mixed)
    assert float(out[0].max()) == pytest.approx(0.5)   # DN tile /10000
    assert float(out[1].max()) == pytest.approx(0.5)   # unit tile untouched


def test_normalize_raw_unbatched_and_rank_check():
    # an unbatched [H, W, C] tile gets ONE per-image scale (not per-row)
    tile = jnp.full((4, 4, 13), 5000.0).at[0].set(20.0)
    out = normalize_raw(tile)
    assert float(out.max()) == pytest.approx(0.5)
    assert float(out[0, 0, 0]) == pytest.approx(20.0 / 10000.0)
    # extra leading axes are batch-like
    stacked = jnp.stack([jnp.full((2, 4, 4, 13), 5000.0)] * 3)
    assert normalize_raw(stacked).shape == (3, 2, 4, 4, 13)
    with pytest.raises(ValueError, match="H, W, C"):
        normalize_raw(jnp.ones((4, 4)))


def test_model_range_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 8, 8, 13)).astype(np.float32))
    y = to_model_range(x)
    assert float(y.min()) >= -2.0 and float(y.max()) <= 2.0
    back = from_model_range(y)
    assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_resize_matches_torch_bilinear():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    tile = rng.uniform(0, 1, (2, 64, 64, 13)).astype(np.float32)
    got = np.asarray(preprocess_tiles(jnp.asarray(tile), target_size=192))

    t = torch.from_numpy(np.transpose(tile, (0, 3, 1, 2)))
    want = torch.nn.functional.interpolate(
        t, size=(192, 192), mode="bilinear", align_corners=False
    )
    want = (torch.clamp(want, 0, 1) - 0.5) / 0.25
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    assert np.allclose(got, want, atol=1e-4)


# ---------------- Pallas fused corruption kernel ----------------


def test_pallas_noise_structural_interpret():
    """Interpret mode stubs the hardware PRNG (zero bits), so only the
    structure is checkable on CPU: shape/dtype/clamp/determinism and the
    per-component gating. Statistics are validated on a real TPU by
    test_pallas_noise_statistics_tpu."""
    from jax.experimental.pallas import tpu as pltpu

    from msid_tpu.ops.pallas_noise import apply_sensor_noise_pallas
    from msid_tpu.ops.noise import NoiseConfig

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-2, 2, (2, 32, 32, 13)).astype(np.float32)
    )
    cfg = NoiseConfig(enable_striping=True)
    with pltpu.force_tpu_interpret_mode():
        y = apply_sensor_noise_pallas(jnp.int32(1), x, cfg)
        y2 = apply_sensor_noise_pallas(jnp.int32(1), x, cfg)
    y, y2 = np.asarray(y), np.asarray(y2)
    assert y.shape == x.shape and y.dtype == np.float32
    assert np.isfinite(y).all()
    assert y.min() >= -3.0 and y.max() <= 3.0
    assert np.array_equal(y, y2)


def test_pallas_noise_statistics_tpu():
    """Distributional parity with the reference components (TPU only)."""
    if jax.default_backend() != "tpu":
        pytest.skip("hardware PRNG requires a TPU backend")
    from msid_tpu.ops.pallas_noise import apply_sensor_noise_pallas
    from msid_tpu.ops.noise import NoiseConfig

    zeros = jnp.zeros((4, 192, 192, 13), jnp.float32)
    g = np.asarray(apply_sensor_noise_pallas(
        jnp.int32(3), zeros,
        NoiseConfig(gaussian_sigma=0.02, speckle_sigma=0, dead_band_prob=0,
                    thermal_scale=0),
    ))
    assert abs(g.mean()) < 1e-3 and abs(g.std() - 0.02) < 1e-3

    t = np.asarray(apply_sensor_noise_pallas(
        jnp.int32(5), zeros,
        NoiseConfig(gaussian_sigma=0, speckle_sigma=0, dead_band_prob=0,
                    thermal_scale=0.01),
    ))
    assert abs(t[..., 0].std() - 0.01) < 1e-3   # band 1 weight 1.0
    assert abs(t[..., 12].std() - 0.02) < 2e-3  # band 13 weight 2.0

    ones = jnp.ones((8, 192, 192, 13), jnp.float32)
    y = np.asarray(apply_sensor_noise_pallas(jnp.int32(7), ones, NoiseConfig()))
    dead = np.abs(y).mean(axis=(1, 2)) < 0.1
    assert 1 <= dead.sum() <= 20  # Binomial(104, 0.08): ~8.3 ± 2.8


def test_random_band_permutation():
    from msid_tpu.ops.preprocess import random_band_permutation

    x = jnp.asarray(
        np.arange(2 * 4 * 4 * 13, dtype=np.float32).reshape(2, 4, 4, 13)
    )
    y = np.asarray(random_band_permutation(jax.random.PRNGKey(0), x, prob=1.0))
    # bands permuted, content preserved per sample
    for b in range(2):
        assert sorted(np.asarray(x)[b, 0, 0].tolist()) == sorted(y[b, 0, 0].tolist())
    # prob=0 → identity
    y0 = np.asarray(random_band_permutation(jax.random.PRNGKey(0), x, prob=0.0))
    assert np.array_equal(y0, np.asarray(x))


def test_normalize_spectral_roundtrip():
    from msid_tpu.ops.preprocess import denormalize_spectral, normalize_spectral

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 13)).astype(np.float32))
    mean = rng.uniform(0.2, 0.6, 13).astype(np.float32)
    std = rng.uniform(0.1, 0.3, 13).astype(np.float32)
    z = normalize_spectral(x, mean, std)
    assert abs(float(z.mean())) < 5.0
    back = denormalize_spectral(z, mean, std)
    assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_dead_band_mask_matches_corruption():
    """dead_band_mask must reproduce exactly the alive mask the corruption
    applies (same key-split position, same draw)."""
    import jax

    from msid_tpu.ops.noise import NoiseConfig, apply_sensor_noise, dead_band_mask

    cfg = NoiseConfig(gaussian_sigma=0.0, speckle_sigma=0.0,
                      dead_band_prob=0.3, thermal_scale=0.0,
                      enable_striping=False)
    key = jax.random.PRNGKey(123)
    # keep x inside the [-3, 3] clamp so the only effect is the band kill
    x = jax.random.uniform(jax.random.fold_in(key, 1), (4, 8, 8, 13),
                           minval=0.5, maxval=2.5)
    noisy = apply_sensor_noise(key, x, cfg)
    alive = dead_band_mask(key, x.shape, cfg)
    # with only the dead-band component active, noisy == x * alive
    np.testing.assert_allclose(np.asarray(noisy),
                               np.asarray(x * alive.astype(x.dtype)),
                               rtol=0, atol=0)
    a = np.asarray(alive)
    assert a.shape == (4, 1, 1, 13)
    assert 0 < a.sum() < a.size  # some dead, some alive at p=0.3
