"""Dead-band detection + linear fill (ops/fill.py) and its model wiring.

The fill stage turns the floor study's zero-skill `linear_fill` baseline
(benchmarks/floor_study.py, 46.4 dB on the 512 protocol) into an input
stage of the model, so tests pin three things: (1) the batched masked
solve matches an independent per-pattern restricted solve, (2) detection
from the corrupted input recovers the corruption's true dead mask, and
(3) the model wiring is neutral without dead bands and exactly the
linear-fill baseline at residual init.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msid_tpu.models import SatMAERestoration, init_model
from msid_tpu.ops.fill import (
    RIDGE,
    detect_alive,
    detect_and_fill,
    fill_weights,
    fit_gram,
    linear_fill,
)
from msid_tpu.ops.noise import NoiseConfig, apply_sensor_noise, dead_band_mask

C = 13


def _reference_fill(x, alive, gram, ridge=RIDGE):
    """Independent per-pattern restricted solve (the floor study's
    `_solve_fill` semantics, re-derived here in plain numpy)."""
    b = x.shape[0]
    out = x.copy()
    for s in range(b):
        al = alive[s].astype(bool)
        surv = [j for j in range(C) if al[j]] + [C]
        flat = x[s].reshape(-1, C)
        z = np.concatenate([flat * al, np.ones((flat.shape[0], 1))], axis=-1)
        for tgt in range(C):
            if al[tgt]:
                continue
            a_mat = gram[np.ix_(surv, surv)] + ridge * np.eye(len(surv))
            b_vec = gram[np.ix_(surv, [tgt])]
            w = np.linalg.solve(a_mat, b_vec)[:, 0]
            out[s].reshape(-1, C)[:, tgt] = z[:, surv] @ w
    return out


def _random_gram(rng):
    """A plausible SPD second-moment matrix for 13 correlated bands."""
    basis = rng.normal(size=(C + 1, C + 1))
    g = basis @ basis.T / (C + 1)
    g[C, C] = 1.0  # E[1·1]
    return g


def test_fill_matches_restricted_solve(rng):
    gram = _random_gram(rng)
    x = rng.normal(size=(4, 8, 8, C)).astype(np.float32)
    alive = np.ones((4, C), np.float32)
    alive[1, [2, 7]] = 0.0
    alive[2, [0]] = 0.0
    alive[3, : C - 1] = 0.0  # extreme: one surviving band
    got = np.asarray(linear_fill(
        jnp.asarray(x), jnp.asarray(alive), jnp.asarray(gram)))
    want = _reference_fill(x * alive[:, None, None, :], alive, gram)
    # fp32 device solve vs fp64 numpy reference
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fill_passthrough_when_all_alive(rng):
    gram = _random_gram(rng)
    x = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    alive = np.ones((2, C), np.float32)
    got = np.asarray(linear_fill(jnp.asarray(x), jnp.asarray(alive), jnp.asarray(gram)))
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_fill_weights_zero_rows_for_dead_bands(rng):
    gram = _random_gram(rng)
    alive = np.ones((1, C), np.float32)
    alive[0, [3, 9]] = 0.0
    w = np.asarray(fill_weights(jnp.asarray(gram), jnp.asarray(alive)))
    # dead input rows are exactly zero: killed bands never leak into fills
    np.testing.assert_array_equal(w[0, 3, :], 0.0)
    np.testing.assert_array_equal(w[0, 9, :], 0.0)


def test_identity_gram_is_neutral(rng):
    """The unfitted (identity) Gram predicts 0 for dead bands — exactly
    the no-fill behavior, so an unfitted input_fill model is safe."""
    x = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    alive = np.ones((2, C), np.float32)
    alive[0, 5] = 0.0
    got = np.asarray(linear_fill(
        jnp.asarray(x), jnp.asarray(alive), jnp.eye(C + 1)))
    want = x * alive[:, None, None, :]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_detection_recovers_corruption_mask(rng):
    """Detection from the corrupted tile == the corruption's own draw,
    at reference noise levels, over many samples."""
    cfg = NoiseConfig()  # base.yaml levels: dead_band_prob 0.08
    clean = jnp.asarray(
        rng.uniform(-2.0, 2.0, size=(64, 16, 16, C)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    noisy = apply_sensor_noise(key, clean, cfg)
    true_alive = np.asarray(
        dead_band_mask(key, clean.shape, cfg), np.float32)[:, 0, 0, :]
    detected = np.asarray(detect_alive(noisy))[:, 0, 0, :]
    np.testing.assert_array_equal(detected, true_alive)


def test_detection_with_striping(rng):
    cfg = NoiseConfig(enable_striping=True)
    clean = jnp.asarray(
        rng.uniform(-2.0, 2.0, size=(32, 16, 16, C)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    noisy = apply_sensor_noise(key, clean, cfg)
    true_alive = np.asarray(
        dead_band_mask(key, clean.shape, cfg), np.float32)[:, 0, 0, :]
    detected = np.asarray(detect_alive(noisy))[:, 0, 0, :]
    np.testing.assert_array_equal(detected, true_alive)


def test_fit_gram_recovers_second_moments(rng):
    """fit_gram over a loader of known tiles equals E[z zᵀ] of the
    preprocessed pixels."""
    from msid_tpu.ops.preprocess import preprocess_tiles

    tiles = rng.uniform(0, 10000, size=(6, 8, 8, C)).astype(np.float32)
    loader = [tiles[:3], tiles[3:]]
    gram = fit_gram(loader, image_size=8)
    clean = np.asarray(preprocess_tiles(jnp.asarray(tiles), 8))
    z = clean.reshape(-1, C)
    z = np.concatenate([z, np.ones((z.shape[0], 1), np.float32)], axis=-1)
    want = (z.T @ z) / z.shape[0]
    np.testing.assert_allclose(gram, want, rtol=1e-4, atol=1e-5)
    assert gram.shape == (C + 1, C + 1)


SMALL_FILL = dict(
    image_size=64, patch_size=16, embed_dim=96, depth=2, num_heads=4,
    decoder_channels=(48, 24, 12, 8), gradient_checkpointing=False,
)


@pytest.fixture(scope="module")
def fill_model_and_vars():
    model = SatMAERestoration(input_fill=True, residual_output=True,
                              **SMALL_FILL)
    variables = init_model(model, jax.random.PRNGKey(0))
    return model, variables


def test_fill_model_neutral_without_dead_bands(rng):
    """No dead bands → filled == x and the zero-init mask conditioning is
    a no-op, so a (non-residual) fill model's forward is bit-comparable
    to the fill-less model with the same init seed."""
    fill_model = SatMAERestoration(input_fill=True, **SMALL_FILL)
    fill_vars = init_model(fill_model, jax.random.PRNGKey(0))
    plain = SatMAERestoration(**SMALL_FILL)
    plain_vars = init_model(plain, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1.5, 1.5, size=(2, 64, 64, C)).astype(np.float32))
    y_fill = fill_model.apply(fill_vars, x, train=False)
    y_plain = plain.apply(plain_vars, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_fill), np.asarray(y_plain), rtol=1e-4, atol=1e-5)


def test_fill_model_init_is_linear_fill_baseline(rng, fill_model_and_vars):
    """residual + zero-init head + fitted gram → the model at init IS the
    floor study's linear_fill baseline (output == filled input exactly)."""
    model, variables = fill_model_and_vars
    gram = jnp.asarray(_random_gram(rng).astype(np.float32))
    variables = dict(variables)
    variables["params"] = dict(variables["params"])
    variables["params"]["fill_gram"] = gram
    x = rng.uniform(-1.5, 1.5, size=(2, 64, 64, C)).astype(np.float32)
    x[0, :, :, 4] = 0.0  # a dead band
    x = jnp.asarray(x)
    y = model.apply(variables, x, train=False)
    filled, alive = detect_and_fill(x, gram)
    assert float(np.asarray(alive)[0, 0, 0, 4]) == 0.0
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(filled), rtol=1e-4, atol=1e-5)
    # and the fill actually changed the dead band
    assert float(jnp.abs(filled[0, :, :, 4]).max()) > 0.0


def test_fill_model_gradients_finite(fill_model_and_vars):
    model, variables = fill_model_and_vars

    def loss(params, x, target):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean((out - target) ** 2)

    rng_np = np.random.default_rng(1)
    x = rng_np.uniform(-1.5, 1.5, size=(2, 64, 64, C)).astype(np.float32)
    x[1, :, :, 7] = 0.0
    target = rng_np.uniform(-1.5, 1.5, size=(2, 64, 64, C)).astype(np.float32)
    grads = jax.grad(loss)(variables["params"], jnp.asarray(x), jnp.asarray(target))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fill_gram_frozen_in_optimizer(fill_model_and_vars):
    from msid_tpu.training.optim import label_params

    _, variables = fill_model_and_vars
    labels = label_params(variables["params"])
    assert labels["fill_gram"] == "frozen"
    assert labels["mask_cond"]["kernel"] == "decoder"


def test_fill_model_from_config():
    config = {
        "data": {"image_size": 64},
        "model": {
            "encoder": {"patch_size": 16, "embed_dim": 96, "depth": 2,
                        "num_heads": 4, "input_channels": 13,
                        "gradient_checkpointing": False},
            "decoder": {"architecture": "unet_skip",
                        "channels": [48, 24, 12, 8],
                        "residual": True},
            "input_fill": {"enabled": True, "rms_thresh": 0.07},
        },
    }
    model = SatMAERestoration.from_config(config)
    assert model.input_fill and model.residual_output
    assert model.fill_rms_thresh == pytest.approx(0.07)
    variables = init_model(model, jax.random.PRNGKey(0))
    assert "fill_gram" in variables["params"]
    y = model.apply(variables, jnp.zeros((1, 64, 64, C)), train=False)
    assert y.shape == (1, 64, 64, C)


def test_fill_improves_over_no_fill_on_dead_bands(rng):
    """End-to-end sanity: with a gram fit on correlated data, filling a
    dead band reconstructs it far better than leaving zeros."""
    # correlated bands: each a noisy affine function of one latent field
    latent = rng.normal(size=(32, 8, 8, 1))
    gains = rng.uniform(0.5, 1.5, size=C)
    offsets = rng.uniform(-0.3, 0.3, size=C)
    tiles = (latent * gains + offsets
             + 0.05 * rng.normal(size=(32, 8, 8, C))).astype(np.float32)
    z = tiles.reshape(-1, C)
    z = np.concatenate([z, np.ones((z.shape[0], 1), np.float32)], axis=-1)
    gram = jnp.asarray((z.T @ z) / z.shape[0])

    x = tiles[:4].copy()
    x[:, :, :, 6] = 0.0
    alive = np.ones((4, C), np.float32)
    alive[:, 6] = 0.0
    filled = np.asarray(linear_fill(jnp.asarray(x), jnp.asarray(alive), gram))
    err_fill = np.mean((filled[:, :, :, 6] - tiles[:4, :, :, 6]) ** 2)
    err_zero = np.mean(tiles[:4, :, :, 6] ** 2)
    assert err_fill < 0.1 * err_zero
