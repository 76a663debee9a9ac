"""Training core: schedules, optimizer groups/freezing, fused train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msid_tpu.models import SatMAERestoration, init_model
from msid_tpu.ops.noise import NoiseConfig
from msid_tpu.training.losses import LossConfig
from msid_tpu.training.optim import build_optimizer, build_optimizer_from_config, label_params
from msid_tpu.training.schedules import build_schedule, cosine_warm_restarts
from msid_tpu.training.train_state import TrainState, make_eval_step, make_train_step

SMALL = dict(
    image_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
    decoder_channels=(32, 16, 8, 8), gradient_checkpointing=False,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    return model, variables


# ---------------- schedules ----------------


def test_sgdr_restarts():
    sched = cosine_warm_restarts(1e-3, t_0=10, t_mult=2, eta_min=1e-6)
    assert float(sched(0)) == pytest.approx(1e-3)
    # near the end of the first cycle LR approaches eta_min
    assert float(sched(9)) < 1e-4
    # restart at step 10
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    # second cycle is 20 long: step 30 restarts again
    assert float(sched(30)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(29)) < 1e-4


def test_sgdr_torch_parity():
    """Closed-form SGDR must match torch CosineAnnealingWarmRestarts
    exactly (incl. restarts at 10/30/70 with T_mult=2)."""
    torch = pytest.importorskip("torch")

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-3)
    ts = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=10, T_mult=2, eta_min=1e-6
    )
    ours = cosine_warm_restarts(1e-3, 10, 2, 1e-6)
    for step in range(100):
        assert float(ours(step)) == pytest.approx(ts.get_last_lr()[0], abs=1e-9)
        ts.step()


def test_sgdr_t_mult_1_is_cheap():
    """T_mult=1 must not enumerate cycles (the join_schedules trap that
    stalled compilation for ~35 min on quick_test)."""
    import time

    t0 = time.perf_counter()
    sched = cosine_warm_restarts(1e-3, 5, 1, 1e-6)
    vals = [float(sched(s)) for s in (0, 4, 5, 1_000_000)]
    assert time.perf_counter() - t0 < 5.0
    assert vals[0] == pytest.approx(1e-3)
    assert vals[2] == pytest.approx(1e-3)  # restart
    assert vals[1] < 1e-4


def test_build_schedule_from_config():
    cfg = {
        "training": {
            "optimizer": {"lr": 1e-4},
            "scheduler": {"type": "CosineAnnealingWarmRestarts", "T_0": 5,
                          "T_mult": 1, "eta_min": 1e-6},
        }
    }
    sched = build_schedule(cfg)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(5)) == pytest.approx(1e-4, rel=1e-3)


# ---------------- optimizer groups ----------------


def test_label_params(model_and_vars):
    _, variables = model_and_vars
    labels = label_params(variables["params"], freeze_layers=(0,))
    flat = jax.tree_util.tree_leaves_with_path(labels)
    seen = set(jax.tree_util.tree_leaves(labels))
    assert seen == {"frozen", "encoder", "decoder"}
    for path, lab in flat:
        keys = [getattr(p, "key", "") for p in path]
        if "encoder" in keys and "blocks_0" in keys:
            assert lab == "frozen"
        elif "encoder" in keys:
            assert lab == "encoder"
        else:
            assert lab == "decoder"


def test_frozen_params_do_not_update(model_and_vars):
    model, variables = model_and_vars
    tx = build_optimizer(
        optax.constant_schedule(1e-2), freeze_layers=(0,), params=variables["params"]
    )
    state = TrainState.create(variables, tx)
    step = make_train_step(
        model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
        accum_steps=1, image_size=64,
    )
    batch = np.random.default_rng(0).uniform(0, 10000, (2, 64, 64, 13)).astype(np.float32)
    new_state, metrics = step(state, jnp.asarray(batch), jax.random.PRNGKey(0))

    frozen_before = variables["params"]["encoder"]["blocks_0"]
    frozen_after = new_state.params["encoder"]["blocks_0"]
    for a, b in zip(jax.tree_util.tree_leaves(frozen_before), jax.tree_util.tree_leaves(frozen_after)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # unfrozen encoder block and decoder must move
    moved = jax.tree_util.tree_leaves(new_state.params["encoder"]["blocks_1"])
    orig = jax.tree_util.tree_leaves(variables["params"]["encoder"]["blocks_1"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(orig, moved))


def test_encoder_lr_scale():
    """With SGD-like dynamics the encoder step must be ~0.1x the decoder's.
    Verified via the adamw update magnitudes on a toy tree."""
    params = {"encoder": {"blocks_0": {"w": jnp.ones((4, 4))}},
              "decoder": {"w": jnp.ones((4, 4))}}
    tx = build_optimizer(
        optax.constant_schedule(1e-2), gradient_clip=0.0,
        encoder_lr_scale=0.1, params=params,
    )
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    enc_mag = float(jnp.abs(updates["encoder"]["blocks_0"]["w"]).mean())
    dec_mag = float(jnp.abs(updates["decoder"]["w"]).mean())
    assert enc_mag == pytest.approx(0.1 * dec_mag, rel=0.05)


# ---------------- train step ----------------


def _make_setup(model, variables, accum=2, **loss_kw):
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    state = TrainState.create(variables, tx)
    step = make_train_step(
        model, tx, LossConfig(**loss_kw), NoiseConfig(), accum_steps=accum, image_size=64
    )
    return tx, state, step


def test_train_step_runs_and_decreases_loss(model_and_vars):
    model, variables = model_and_vars
    tx, state, step = _make_setup(model, variables, accum=2, ssim_weight=0.0)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(0, 10000, (4, 64, 64, 13)).astype(np.float32))
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 12
    assert int(state.nan_skips) == 0
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_band_permutation_augmented_step(model_and_vars):
    """band_permutation_prob wires the spectral augmentation into the
    jitted step: the step still trains, and with prob=1 the corrupted
    input differs from the unaugmented run while staying finite."""
    model, variables = model_and_vars
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(0, 10000, (4, 64, 64, 13)).astype(np.float32))

    losses = {}
    for prob in (0.0, 1.0):
        state = TrainState.create(variables, tx)
        step = make_train_step(
            model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
            accum_steps=1, image_size=64, band_permutation_prob=prob,
        )
        state, m = step(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(m["loss"]))
        losses[prob] = float(m["loss"])
    # prob=1 consumed a split key + permuted bands → different loss value
    assert losses[0.0] != losses[1.0]


def test_grad_accum_equivalence():
    """accum=4 over batch 4 must match accum=1 over the same batch
    (mean-of-micro-grads == full-batch grad for mean losses).

    Uses GroupNorm: with BatchNorm the equivalence genuinely does not hold
    (micro-batch 1 normalizes over different statistics than batch 4)."""
    model = SatMAERestoration(**SMALL, norm="group")
    variables = init_model(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.uniform(0, 10000, (4, 64, 64, 13)).astype(np.float32))
    key = jax.random.PRNGKey(3)

    results = []
    for accum in (1, 4):
        tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
                               accum_steps=accum, image_size=64)
        new_state, m = step(state, batch, key)
        results.append((new_state, float(m["loss"])))

    (s1, l1), (s4, l4) = results
    # identical corruption key → identical data; only grouping differs.
    assert l1 == pytest.approx(l4, rel=1e-4)
    a = np.asarray(s1.params["encoder"]["pos_embed"])
    b = np.asarray(s4.params["encoder"]["pos_embed"])
    assert np.allclose(a, b, atol=1e-5)


def test_nan_guard_skips_update(model_and_vars):
    model, variables = model_and_vars
    tx, state, step = _make_setup(model, variables, accum=1, ssim_weight=0.0)
    bad = jnp.full((2, 64, 64, 13), jnp.nan, jnp.float32)
    new_state, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 1
    assert int(new_state.nan_skips) == 1
    assert int(new_state.step) == 0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # and a good batch afterwards still works (moments unpolluted)
    good = jnp.asarray(np.random.default_rng(0).uniform(0, 10000, (2, 64, 64, 13)).astype(np.float32))
    s2, m2 = step(new_state, good, jax.random.PRNGKey(1))
    assert int(m2["skipped"]) == 0
    assert np.isfinite(float(m2["loss"]))


def test_ema_shadow_tracks_params(model_and_vars):
    """ema += (1-d)(p - e) on the updated params each finite step; the
    shadow must match a host-side replay of the params trajectory, and
    eval_variables must serve it."""
    model, variables = model_and_vars
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    state = TrainState.create(variables, tx, ema=True)
    decay = 0.9
    step = make_train_step(
        model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
        accum_steps=1, image_size=64, ema_decay=decay,
    )
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(0, 10000, (2, 64, 64, 13)).astype(np.float32))

    expect = jax.device_get(state.params)
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        p = jax.device_get(state.params)
        expect = jax.tree_util.tree_map(
            lambda e, q: e + (1.0 - decay) * (q - e), expect, p
        )
    got = jax.device_get(state.ema_params)
    for e, g in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, e, rtol=1e-6, atol=1e-7)
    # the shadow lags the live params (they moved for 3 steps)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state.ema_params))
    )
    assert state.eval_variables["params"] is state.ema_params


def test_ema_untouched_on_skipped_step(model_and_vars):
    model, variables = model_and_vars
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    state = TrainState.create(variables, tx, ema=True)
    step = make_train_step(
        model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
        accum_steps=1, image_size=64, ema_decay=0.99,
    )
    bad = jnp.full((2, 64, 64, 13), jnp.nan, jnp.float32)
    new_state, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(new_state.ema_params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_ema_requires_shadow(model_and_vars):
    model, variables = model_and_vars
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    state = TrainState.create(variables, tx)  # no shadow
    step = make_train_step(
        model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
        accum_steps=1, image_size=64, ema_decay=0.99,
    )
    batch = jnp.zeros((2, 64, 64, 13), jnp.float32)
    with pytest.raises(ValueError, match="ema"):
        step(state, batch, jax.random.PRNGKey(0))


def test_eval_step_sums(model_and_vars):
    model, variables = model_and_vars
    eval_step = make_eval_step(model, LossConfig(), NoiseConfig(), image_size=64)
    batch = jnp.asarray(np.random.default_rng(0).uniform(0, 10000, (4, 64, 64, 13)).astype(np.float32))
    sums = eval_step(variables, batch, jax.random.PRNGKey(0), jnp.int32(4))
    assert set(sums) == {"psnr", "ssim", "sam", "rmse", "count", "loss"}
    assert float(sums["count"]) == 4.0
    # deterministic for a fixed key
    sums2 = eval_step(variables, batch, jax.random.PRNGKey(0), jnp.int32(4))
    assert float(sums["psnr"]) == float(sums2["psnr"])


def test_eval_step_masked_padding(model_and_vars):
    """A batch padded to the static shape with count=k must reproduce the
    unpadded k-sample sums exactly (noise disabled so the per-sample
    corruption is independent of batch size)."""
    model, variables = model_and_vars
    quiet = NoiseConfig(
        gaussian_sigma=0.0, speckle_sigma=0.0, dead_band_prob=0.0,
        thermal_scale=0.0, enable_striping=False,
    )
    eval_step = make_eval_step(model, LossConfig(), quiet, image_size=64)
    rng = np.random.default_rng(3)
    real = rng.uniform(0, 10000, (3, 64, 64, 13)).astype(np.float32)
    pad = np.repeat(real[:1], 1, axis=0)
    padded = jnp.asarray(np.concatenate([real, pad], axis=0))

    masked = eval_step(variables, padded, jax.random.PRNGKey(0), jnp.int32(3))
    unpadded = eval_step(
        variables, jnp.asarray(real), jax.random.PRNGKey(0), jnp.int32(3)
    )
    assert float(masked["count"]) == 3.0
    for k in ("psnr", "ssim", "sam", "rmse", "loss"):
        assert float(masked[k]) == pytest.approx(float(unpadded[k]), rel=1e-6), k


def test_per_sample_loss_matches_combined(model_and_vars):
    from msid_tpu.training.losses import combined_loss, combined_loss_per_sample

    rng = np.random.default_rng(4)
    pred = jnp.asarray(rng.normal(size=(4, 32, 32, 13)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(4, 32, 32, 13)).astype(np.float32))
    cfg = LossConfig(mse_weight=1.0, ssim_weight=0.1, perceptual_weight=0.05)
    total, _ = combined_loss(pred, target, cfg)
    per_sample = combined_loss_per_sample(pred, target, cfg)
    assert per_sample.shape == (4,)
    assert float(jnp.mean(per_sample)) == pytest.approx(float(total), rel=1e-5)


def test_build_optimizer_from_config(model_and_vars):
    _, variables = model_and_vars
    cfg = {
        "model": {"encoder": {"freeze_layers": [0]}},
        "training": {
            "optimizer": {"lr": "1e-4", "weight_decay": 0.05, "betas": [0.9, 0.999]},
            "scheduler": {"type": "CosineAnnealingWarmRestarts", "T_0": 10, "T_mult": 2,
                          "eta_min": 1e-6},
            "gradient_clip": 1.0,
        },
    }
    tx, sched = build_optimizer_from_config(cfg, variables["params"])
    assert float(sched(0)) == pytest.approx(1e-4)
    opt_state = tx.init(variables["params"])
    grads = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
    updates, _ = tx.update(grads, opt_state, variables["params"])


def test_eval_step_ensemble(model_and_vars):
    """ensemble_size=2 with two IDENTICAL members must reproduce the
    single-checkpoint sums (to executable-level tolerance: the mean of
    equal outputs is the identity, but the two jits are different XLA
    programs and conv fusion choices shift bf16 numerics ~1e-5 — the
    same cross-program variation decoder_ablation.py documents); with
    two DIFFERENT members it must differ from both, and the step must
    accept the tuple-of-variables calling convention."""
    model, variables = model_and_vars
    batch = jnp.asarray(
        np.random.default_rng(5).uniform(0, 10000, (4, 64, 64, 13))
        .astype(np.float32))
    key, count = jax.random.PRNGKey(0), jnp.int32(4)

    single = make_eval_step(model, LossConfig(), NoiseConfig(), image_size=64)
    pair = make_eval_step(model, LossConfig(), NoiseConfig(), image_size=64,
                          ensemble_size=2)
    s1 = single(variables, batch, key, count)
    s_same = pair((variables, variables), batch, key, count)
    for k in ("psnr", "ssim", "sam", "rmse", "loss"):
        assert float(s_same[k]) == pytest.approx(float(s1[k]), rel=2e-4), k

    # A member with doubled params restores wildly differently; the mean
    # restoration must land strictly between the two singles (scoring the
    # averaged OUTPUT, not averaging the metrics) and be order-invariant.
    other = jax.tree_util.tree_map(lambda p: p * 2.0, variables)
    s2 = single(other, batch, key, count)
    s_mix = pair((variables, other), batch, key, count)
    s_mix_rev = pair((other, variables), batch, key, count)
    assert float(s1["rmse"]) < float(s_mix["rmse"]) < float(s2["rmse"])
    assert float(s_mix_rev["rmse"]) == float(s_mix["rmse"])


def test_eval_step_ensemble_validation(model_and_vars):
    model, _ = model_and_vars
    with pytest.raises(ValueError, match="ensemble_size"):
        make_eval_step(model, LossConfig(), NoiseConfig(), image_size=64,
                       ensemble_size=0)
    with pytest.raises(ValueError, match="hybrid"):
        make_eval_step(model, LossConfig(), NoiseConfig(), image_size=64,
                       ensemble_size=2, forward_impl="hybrid")


def test_evaluate_model_accepts_variable_list(model_and_vars):
    """evaluate_model's tuple/list detection: a [v, v] ensemble scores
    the same as v alone."""
    from msid_tpu.training.eval import evaluate_model

    model, variables = model_and_vars
    batch = np.random.default_rng(9).uniform(
        0, 10000, (4, 64, 64, 13)).astype(np.float32)
    loader = [batch]
    r1 = evaluate_model(model, variables, loader, image_size=64, verbose=False)
    r2 = evaluate_model(model, [variables, variables], loader, image_size=64,
                        verbose=False)
    assert r2["psnr"] == pytest.approx(r1["psnr"], rel=1e-6)
    assert r2["num_samples"] == r1["num_samples"] == 4
