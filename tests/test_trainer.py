"""Trainer driver: fit loop, mesh auto-DP, checkpoint resume, early stop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msid_tpu.models import SatMAERestoration, init_model
from msid_tpu.training import TrainState, Trainer, build_optimizer
from msid_tpu.utils.checkpointing import CheckpointManager

SMALL = dict(
    image_size=64, patch_size=16, embed_dim=64, depth=1, num_heads=2,
    decoder_channels=(16, 8, 8, 8), gradient_checkpointing=False, norm="group",
)

CONFIG = {
    "seed": 0,
    "data": {"image_size": 64},
    "training": {"gradient_accumulation_steps": 1, "loss": {"ssim_weight": 0.0}},
    "noise": {},
}


def _loader(n_batches=2, batch=8, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.uniform(0, 10000, (batch, 64, 64, 13)).astype(np.float32)
            for _ in range(n_batches)]


def _make_trainer(config=None, manager=None):
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    state = TrainState.create(variables, tx)
    return Trainer(model, tx, state, config=config or CONFIG,
                   checkpoint_manager=manager,
                   lr_schedule=optax.constant_schedule(1e-3))


def test_fit_uses_mesh_and_decreases_loss():
    trainer = _make_trainer()
    # 8 virtual CPU devices → auto data-parallel mesh
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    history = trainer.fit(_loader(3), _loader(1, seed=9), epochs=3)
    assert len(history["train_loss"]) == 3
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert np.isfinite(history["val_psnr"]).all()


def test_indivisible_batch_raises():
    trainer = _make_trainer()
    with pytest.raises(ValueError, match="not divisible"):
        trainer.fit(_loader(1, batch=7), _loader(1, batch=8), epochs=1)


def test_mesh_disabled_by_config():
    cfg = dict(CONFIG, parallel={"enabled": False})
    trainer = _make_trainer(cfg)
    assert trainer.mesh is None
    history = trainer.fit(_loader(1), _loader(1), epochs=1)
    assert len(history["train_loss"]) == 1


def test_checkpoint_save_and_resume(tmp_path):
    mgr = CheckpointManager(tmp_path, keep_top_k=2, metric="val_psnr",
                            save_every=1)
    trainer = _make_trainer(manager=mgr)
    trainer.fit(_loader(2), _loader(1, seed=9), epochs=2)
    mgr.wait_until_finished()
    assert mgr.all_steps()

    trainer2 = _make_trainer(manager=CheckpointManager(tmp_path))
    start = trainer2.load_checkpoint()
    assert start == 2
    assert trainer2.history["val_psnr"] == trainer.history["val_psnr"]
    # resumed state continues training
    history = trainer2.fit(_loader(2), _loader(1, seed=9), epochs=3,
                           start_epoch=start)
    assert len(history["train_loss"]) == 3


def test_compact_background_checkpoint_roundtrip(tmp_path):
    """moments_dtype=bf16 + background_transfer: the saved AdamW moments are
    bf16 on disk, a plain manager restores them back to fp32 within one bf16
    ulp, and params stay bit-exact (never cast)."""
    mgr = CheckpointManager(tmp_path, metric="val_psnr",
                            moments_dtype="bfloat16", background_transfer=True)
    trainer = _make_trainer(manager=mgr)
    trainer.fit(_loader(2), _loader(1, seed=9), epochs=1)
    mgr.wait_until_finished()
    assert mgr.all_steps() == [1]

    trainer2 = _make_trainer(manager=CheckpointManager(tmp_path))
    assert trainer2.load_checkpoint() == 1

    for lo, lr in zip(jax.tree.leaves(trainer.state.opt_state),
                      jax.tree.leaves(trainer2.state.opt_state)):
        assert lo.dtype == lr.dtype  # cast back up to the live target dtype
        if lo.dtype == jnp.float32 and lo.ndim > 0:  # the cast moments
            np.testing.assert_allclose(
                np.asarray(lr), np.asarray(lo), rtol=1 / 256, atol=0)
        else:  # counts / schedule scalars stay exact
            np.testing.assert_array_equal(np.asarray(lr), np.asarray(lo))
    for po, pr in zip(jax.tree.leaves(trainer.state.params),
                      jax.tree.leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(po), np.asarray(pr))


def test_ema_trainer_checkpoint_adaptation(tmp_path):
    """An EMA run's checkpoint restores into (a) another EMA trainer
    (shadow round-trips bit-exactly) and (b) a plain evaluate/export-style
    target without the field (eval_variables serves the saved shadow);
    and a pre-EMA checkpoint resumes into an EMA run with the shadow
    re-seeded from the restored params."""
    ema_cfg = dict(CONFIG, training=dict(CONFIG["training"], ema_decay=0.9))
    mgr = CheckpointManager(tmp_path / "a", metric="val_psnr", save_every=1)
    trainer = _make_trainer(config=ema_cfg, manager=mgr)
    trainer.fit(_loader(2), _loader(1, seed=9), epochs=1)
    mgr.wait_until_finished()
    assert trainer.state.ema_params is not None
    # the shadow lags the live params after a few updates
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(trainer.state.params),
                        jax.tree.leaves(trainer.state.ema_params))
    )

    # (a) EMA trainer resumes: shadow bit-exact
    trainer2 = _make_trainer(config=ema_cfg,
                             manager=CheckpointManager(tmp_path / "a"))
    assert trainer2.load_checkpoint() == 1
    for a, b in zip(jax.tree.leaves(trainer.state.ema_params),
                    jax.tree.leaves(trainer2.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) plain target (evaluate/export path): the shadow is restored and
    # eval_variables serves it
    plain = _make_trainer(manager=None)  # ema off: state.ema_params is None
    out = CheckpointManager(tmp_path / "a").load_latest(target=plain.state)
    assert out is not None
    restored = out[0]
    assert restored.ema_params is not None
    assert restored.eval_variables["params"] is restored.ema_params
    for a, b in zip(jax.tree.leaves(trainer.state.ema_params),
                    jax.tree.leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (c) pre-EMA checkpoint → EMA-enabled run: shadow re-seeded from params
    mgr_b = CheckpointManager(tmp_path / "b", metric="val_psnr", save_every=1)
    pre = _make_trainer(manager=mgr_b)  # no EMA
    pre.fit(_loader(2), _loader(1, seed=9), epochs=1)
    mgr_b.wait_until_finished()
    resumed = _make_trainer(config=ema_cfg,
                            manager=CheckpointManager(tmp_path / "b"))
    assert resumed.load_checkpoint() == 1
    for p, e in zip(jax.tree.leaves(resumed.state.params),
                    jax.tree.leaves(resumed.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(e))

    # (d) EMA checkpoint → ema_decay=0 run: the shadow must be DROPPED,
    # not carried frozen — a kept shadow would never update again and
    # validation/best-K would permanently score restore-time weights.
    noema = _make_trainer(manager=CheckpointManager(tmp_path / "a"))
    assert noema.ema_decay == 0.0
    assert noema.load_checkpoint() == 1
    assert noema.state.ema_params is None
    assert noema.state.eval_variables["params"] is noema.state.params


def test_legacy_checkpoint_without_ema_field_restores(tmp_path):
    """Checkpoints written before TrainState grew `ema_params` have no such
    tree entry on disk (and no `_has_ema` metadata). They must restore into
    today's TrainState — both a plain target (evaluate/export) and an
    EMA-enabled resume (shadow re-seeded from the restored params)."""
    import orbax.checkpoint as ocp

    trainer = _make_trainer()
    trainer.fit(_loader(2), _loader(1, seed=9), epochs=1)

    # Write the checkpoint the way the pre-EMA code did: the state tree is
    # the field dict without `ema_params`, metadata without `_has_ema`
    # (Orbax matches pytree entries by name, not container type).
    legacy_fields = {
        "step": trainer.state.step,
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
        "opt_state": trainer.state.opt_state,
        "nan_skips": trainer.state.nan_skips,
    }
    mgr = CheckpointManager(tmp_path, metric="val_psnr", save_every=1)
    mgr._mgr.save(1, args=ocp.args.Composite(
        state=ocp.args.StandardSave(legacy_fields),
        metadata=ocp.args.JsonSave({"epoch": 1}),
    ))
    mgr.wait_until_finished()

    # (a) plain target — the failing path before the fix
    plain = _make_trainer(manager=None)
    out = CheckpointManager(tmp_path).load_latest(target=plain.state)
    assert out is not None
    restored = out[0]
    assert restored.ema_params is None
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) EMA-enabled resume: shadow re-seeded from the restored params
    ema_cfg = dict(CONFIG, training=dict(CONFIG["training"], ema_decay=0.9))
    resumed = _make_trainer(config=ema_cfg,
                            manager=CheckpointManager(tmp_path))
    assert resumed.load_checkpoint() == 1
    assert resumed.state.ema_params is not None
    for p, e in zip(jax.tree.leaves(resumed.state.params),
                    jax.tree.leaves(resumed.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(e))


def test_validate_padded_loader_single_compile():
    """A padded trailing val batch (pad_last tuples) must reuse the one
    compiled eval executable and average over only the real samples."""
    cfg = dict(CONFIG, parallel={"enabled": False})
    trainer = _make_trainer(cfg)
    rng = np.random.default_rng(5)
    full = rng.uniform(0, 10000, (8, 64, 64, 13)).astype(np.float32)
    real = rng.uniform(0, 10000, (3, 64, 64, 13)).astype(np.float32)
    padded = np.concatenate([real, np.repeat(real[:1], 5, axis=0)], axis=0)

    res = trainer.validate([full, (padded, 3)])
    assert np.isfinite(res["psnr"])
    # one (shape, dtype) signature -> exactly one compiled executable
    assert len(trainer.eval_step._cache) == 1

    # masked average == eval over the 11 real samples (count-weighted)
    from msid_tpu.training.eval import run_eval_loop

    probed = run_eval_loop(
        trainer.eval_step, trainer.state.variables, [full, (padded, 3)],
        jax.random.PRNGKey(trainer.eval_seed), place=trainer._place_batch,
    )
    assert probed["num_samples"] == 11
    assert res["psnr"] == pytest.approx(probed["psnr"])


def test_memory_fits_uses_live_param_count():
    """vit_base collapses accumulation on a 16 GB budget; a 300M-param
    vit_large (4.9 GB params+moments+grads alone) must not."""
    base_cfg = {
        "training": {"micro_batch_size": 8}, "data": {"image_size": 192},
        "model": {"encoder": {"depth": 12, "embed_dim": 768, "patch_size": 16}},
    }
    large_cfg = {
        "training": {"micro_batch_size": 8}, "data": {"image_size": 192},
        "model": {"encoder": {"depth": 24, "embed_dim": 1024, "patch_size": 16}},
    }
    fits_base = Trainer._memory_fits(base_cfg, accum=64, image_size=192,
                                     num_params=96_000_000, limit_gb=16.0)
    fits_large = Trainer._memory_fits(large_cfg, accum=64, image_size=192,
                                      num_params=307_000_000, limit_gb=16.0)
    assert fits_base and not fits_large


def test_early_stopping_triggers():
    cfg = dict(CONFIG, early_stopping={"enabled": True, "patience": 1,
                                       "min_delta": 100.0})
    trainer = _make_trainer(cfg)
    history = trainer.fit(_loader(1), _loader(1, seed=9), epochs=10)
    # min_delta=100 dB is unreachable → stops after patience+1 epochs
    assert len(history["train_loss"]) <= 3


def test_load_weights_crosses_freeze_structure(tmp_path):
    """Two-stage recipe boundary (reference README.md:193-223): stage B
    warm-starts stage A's weights under a DIFFERENT freeze set (different
    multi_transform opt_state structure) and a fresh optimizer.
    load_weights must graft params/batch_stats and leave the new
    opt_state/step untouched."""
    mgr = CheckpointManager(tmp_path, keep_top_k=2, metric="val_psnr",
                            save_every=1)
    # stage A: everything-frozen-but-decoder analogue (freeze block 0)
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    tx_a = build_optimizer(optax.constant_schedule(1e-3),
                           freeze_layers=(0,), params=variables["params"])
    state_a = TrainState.create(variables, tx_a)
    trainer_a = Trainer(model, tx_a, state_a, config=CONFIG,
                        checkpoint_manager=mgr,
                        lr_schedule=optax.constant_schedule(1e-3))
    trainer_a.fit(_loader(2), _loader(1, seed=9), epochs=1)
    mgr.wait_until_finished()

    # stage B: no frozen blocks -> different opt_state structure
    variables_b = init_model(model, jax.random.PRNGKey(1))
    tx_b = build_optimizer(optax.constant_schedule(1e-4),
                           params=variables_b["params"])
    state_b = TrainState.create(variables_b, tx_b)
    out = CheckpointManager(tmp_path).load_weights(state_b)
    assert out is not None
    grafted, _, src_step = out
    assert src_step == 1
    # params came from stage A, not stage B's fresh init
    a_leaf = np.asarray(jax.tree_util.tree_leaves(trainer_a.state.params)[0])
    g_leaf = np.asarray(jax.tree_util.tree_leaves(grafted.params)[0])
    b_leaf = np.asarray(jax.tree_util.tree_leaves(state_b.params)[0])
    np.testing.assert_allclose(g_leaf, a_leaf, atol=1e-6)
    assert not np.allclose(g_leaf, b_leaf)
    # fresh optimizer/step
    assert int(grafted.step) == 0
    # and stage B trains from there under its own optimizer
    trainer_b = Trainer(model, tx_b, grafted, config=CONFIG,
                        lr_schedule=optax.constant_schedule(1e-4))
    hist = trainer_b.fit(_loader(2), _loader(1, seed=9), epochs=1)
    assert np.isfinite(hist["train_loss"]).all()


def test_load_weights_prefers_ema(tmp_path):
    """A source run with an EMA shadow warm-starts from the shadow (its
    served weights), and a shadow-less target stays shadow-less."""
    mgr = CheckpointManager(tmp_path, metric="val_psnr", save_every=1)
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    tx = build_optimizer(optax.constant_schedule(1e-2), params=variables["params"])
    state = TrainState.create(variables, tx, ema=True)
    cfg = dict(CONFIG, training={"gradient_accumulation_steps": 1,
                                 "loss": {"ssim_weight": 0.0},
                                 "ema_decay": 0.5})
    trainer = Trainer(model, tx, state, config=cfg, checkpoint_manager=mgr,
                      lr_schedule=optax.constant_schedule(1e-2))
    trainer.fit(_loader(2), _loader(1, seed=9), epochs=1)
    mgr.wait_until_finished()
    ema_leaf = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.ema_params)[0])
    live_leaf = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0])
    assert not np.allclose(ema_leaf, live_leaf)  # shadow lags at d=0.5

    target = TrainState.create(init_model(model, jax.random.PRNGKey(2)), tx)
    grafted, _, _ = CheckpointManager(tmp_path).load_weights(target)
    g_leaf = np.asarray(jax.tree_util.tree_leaves(grafted.params)[0])
    np.testing.assert_allclose(g_leaf, ema_leaf, atol=1e-6)
    assert grafted.ema_params is None
