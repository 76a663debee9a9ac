"""Deployment: sliding-window scene restoration, visualization, setup helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msid_tpu.models import SatMAERestoration, init_model

SMALL = dict(
    image_size=64, patch_size=16, embed_dim=64, depth=1, num_heads=2,
    decoder_channels=(16, 8, 8, 8), gradient_checkpointing=False, norm="group",
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    return model, variables


# ---------------- sliding-window scene restoration ----------------


def test_window_origins_cover_scene():
    from msid_tpu.deployment.sliding_window import _window_origins

    starts = _window_origins(200, 64, 48)
    assert starts[0] == 0 and starts[-1] == 200 - 64
    covered = np.zeros(200, bool)
    for s in starts:
        covered[s : s + 64] = True
    assert covered.all()
    assert _window_origins(50, 64, 48) == [0]


def test_blend_weights_positive_and_interior_one():
    from msid_tpu.deployment.sliding_window import _blend_weights

    w = _blend_weights(64, 16)
    assert w.shape == (64, 64)
    assert (w > 0).all()
    assert w[32, 32] == pytest.approx(1.0)
    assert w[0, 32] < 0.2  # edge feathered


def test_restore_scene_matches_reference_assembly(model_and_vars):
    """restore_scene must equal an inline reimplementation of the
    windowed blend (same windows, weights, normalization)."""
    from msid_tpu.deployment.sliding_window import (
        _blend_weights,
        _window_origins,
        make_scene_step,
        restore_scene,
    )

    model, variables = model_and_vars
    rng = np.random.default_rng(3)
    scene = rng.uniform(0, 10000, (112, 160, 13)).astype(np.float32)

    out = restore_scene(model, variables, scene,
                        window=64, overlap=16, model_size=64, batch_size=3)
    assert out.shape == scene.shape and np.isfinite(out).all()

    # reference assembly: one window at a time, no batching/padding
    step = make_scene_step(model, variables, window=64, model_size=64)
    wts = _blend_weights(64, 16)[:, :, None]
    num = np.zeros_like(out)
    den = np.zeros((112, 160, 1), np.float32)
    for y in _window_origins(112, 64, 48):
        for x in _window_origins(160, 64, 48):
            tile = scene[y : y + 64, x : x + 64][None]
            pred = np.asarray(step(jnp.asarray(np.repeat(tile, 3, 0))))[0]
            num[y : y + 64, x : x + 64] += pred * wts
            den[y : y + 64, x : x + 64] += wts
    assert np.allclose(out, num / den, atol=1e-4)


def test_restore_scene_rejects_mismatched_step(model_and_vars):
    """A host-assembly step passed with device_assembly=True (and vice
    versa) must fail loudly up front, not with an arity error mid-loop."""
    from msid_tpu.deployment.sliding_window import (
        make_device_scene_step,
        make_scene_step,
        restore_scene,
    )

    model, variables = model_and_vars
    scene = np.zeros((96, 96, 13), np.float32)
    host_step = make_scene_step(model, variables, window=64, model_size=64)
    with pytest.raises(ValueError, match="host assembly"):
        restore_scene(model, variables, scene, window=64, overlap=16,
                      model_size=64, step=host_step, device_assembly=True)
    dev_step = make_device_scene_step(model, variables, window=64,
                                      model_size=64, overlap=16)
    with pytest.raises(ValueError, match="device assembly"):
        restore_scene(model, variables, scene, window=64, overlap=16,
                      model_size=64, step=dev_step, device_assembly=False)


def test_restore_scene_matches_single_window(model_and_vars):
    """Scene == one window → identical to a direct forward pass."""
    from msid_tpu.deployment.sliding_window import restore_scene
    from msid_tpu.ops.preprocess import preprocess_tiles

    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    scene = rng.uniform(0, 10000, (64, 64, 13)).astype(np.float32)

    out = restore_scene(model, variables, scene, window=64, overlap=16,
                        model_size=64, batch_size=2)

    direct_in = preprocess_tiles(jnp.asarray(scene)[None], 64)
    direct = np.asarray(model.apply(variables, direct_in, train=False))[0]
    assert np.allclose(out, direct, atol=1e-4)


def test_scene_step_hybrid_matches_plain():
    """With a BatchNorm model the scene step picks the hybrid (folded-BN)
    graph; it must match the plain model.apply step numerically."""
    from msid_tpu.deployment.sliding_window import make_scene_step

    model = SatMAERestoration(
        image_size=32, patch_size=16, embed_dim=64, depth=1, num_heads=2,
        decoder_channels=(16, 8, 8, 8), gradient_checkpointing=False,
    )
    variables = init_model(model, jax.random.PRNGKey(0))
    batch = jnp.asarray(
        np.random.default_rng(1).uniform(0, 10000, (2, 64, 64, 13)),
        jnp.float32,
    )
    plain = make_scene_step(model, variables, window=64, model_size=32,
                            optimize=False)
    hybrid = make_scene_step(model, variables, window=64, model_size=32)
    np.testing.assert_allclose(
        np.asarray(hybrid(batch)), np.asarray(plain(batch)),
        rtol=2e-4, atol=2e-5,
    )


# ---------------- visualization ----------------


def test_visualization_saves_files(tmp_path, model_and_vars):
    from msid_tpu.utils import visualization as viz

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (32, 32, 13)).astype(np.float32)

    rgb = viz.extract_rgb(img)
    assert rgb.shape == (32, 32, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1

    viz.plot_restoration_triptych(img, img, img, save_path=tmp_path / "t.png",
                                  metrics={"PSNR": 30.0})
    viz.plot_spectral_signatures(img, img, save_path=tmp_path / "s.png",
                                 pixels=((4, 4),))
    viz.plot_training_curves(
        {"train_loss": [1, 0.5], "val_loss": [1.1, 0.6], "val_psnr": [10, 20],
         "val_ssim": [0.1, 0.5], "lr": [1e-4, 5e-5]},
        save_path=tmp_path / "c.png",
    )
    for f in ("t.png", "s.png", "c.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_save_restoration_triptychs(tmp_path, model_and_vars):
    from msid_tpu.utils.visualization import save_restoration_triptychs

    model, variables = model_and_vars
    batch = np.random.default_rng(0).uniform(0, 10000, (2, 64, 64, 13)).astype(np.float32)
    n = save_restoration_triptychs(
        model, variables, [batch], tmp_path, image_size=64, num_samples=2
    )
    assert n == 2
    assert (tmp_path / "sample_00.png").exists()
    assert (tmp_path / "sample_01_spectra.png").exists()


# ---------------- setup helpers ----------------


def test_estimate_memory_reasonable():
    from msid_tpu.utils.setup_helpers import estimate_memory

    mem = estimate_memory(
        {"training": {"micro_batch_size": 8}, "data": {"image_size": 192},
         "model": {"encoder": {"depth": 12, "embed_dim": 768, "patch_size": 16}}},
        num_params=96_000_000,
    )
    # 96M params: 0.38 params + 0.77 opt + 0.38 grads + activations
    assert 1.4 < mem["total_gb"] < 4.0


def test_download_verify_report(tmp_path):
    from msid_tpu.utils.download import verify_downloads, verify_eurosat

    assert not verify_eurosat(tmp_path / "nope")
    # fake a dataset layout
    for cls in range(10):
        d = tmp_path / "data" / f"class_{cls}"
        d.mkdir(parents=True)
        (d / "tile.tif").write_bytes(b"II*\x00" + b"\x00" * 16)
    assert verify_eurosat(tmp_path / "data")
    report = verify_downloads({"data": {"root_dir": str(tmp_path / "data")},
                               "model": {"encoder": {"pretrained_path": None}}})
    assert report["dataset_present"] and not report["weights_present"]


def test_inspect_checkpoint_orbax(tmp_path):
    from msid_tpu.utils.download import inspect_checkpoint

    (tmp_path / "3").mkdir()
    (tmp_path / "7").mkdir()
    info = inspect_checkpoint(tmp_path)
    assert info["format"] == "orbax" and info["steps"] == [3, 7]


# ---------------- int8 weight quantization ----------------


def test_quantize_roundtrip_small_error(model_and_vars):
    from msid_tpu.deployment.quantize import (
        dequantize_params,
        quantization_report,
        quantize_params,
    )

    model, variables = model_and_vars
    qtree, stree = quantize_params(variables["params"])
    # kernels became int8
    k = qtree["encoder"]["patch_embed"]["proj"]["kernel"]
    assert np.asarray(k).dtype == np.int8
    # biases untouched
    b = qtree["encoder"]["patch_embed"]["proj"]["bias"]
    assert np.asarray(b).dtype == np.float32

    hat = dequantize_params(qtree, stree)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(hat)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        if a.size:
            # per-channel int8: relative error bounded by scale/2 ≈ max|w|/254
            assert np.abs(a - b).max() <= np.abs(a).max() / 127 + 1e-7

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 64, 64, 13)).astype(np.float32))
    report = quantization_report(variables, model, x)
    assert report["compression"] > 3.5
    # untrained random weights + GroupNorm amplify int8 rounding; output
    # range is ±3, so <1.0 max error still shows the wiring is sane
    assert report["max_abs_err"] < 1.0
    assert report["mean_abs_err"] < 0.1


# ---------------- notebook helpers ----------------


def test_notebook_helpers(tmp_path, model_and_vars):
    from msid_tpu.data.dataset import SyntheticEuroSAT
    from msid_tpu.utils import notebook_helpers as nb

    model, variables = model_and_vars
    ds = SyntheticEuroSAT(num_samples=8, split="train", tile_size=64)
    info = nb.print_dataset_info(ds)
    assert info["tile_shape"] == (64, 64, 13)

    batch = np.stack([ds[i] for i in range(2)])
    nb.visualize_batch(model, variables, batch, image_size=64,
                       max_samples=2, save_path=tmp_path / "b.png")
    nb.visualize_noise_impact(batch, image_size=64, save_path=tmp_path / "n.png")
    nb.explore_dataset(ds, num_samples=2, save_path=tmp_path / "e.png")
    nb.live_plot_history({"train_loss": [1, 0.5], "val_loss": [1, 0.6],
                          "val_psnr": [10, 12], "val_ssim": [0.1, 0.2],
                          "lr": [1e-4, 1e-4]}, save_path=tmp_path / "h.png")
    for f in ("b.png", "n.png", "e.png", "h.png"):
        assert (tmp_path / f).stat().st_size > 1000
    nb.print_evaluation_summary({"psnr": 30.0, "ssim": 0.9, "sam": 2.0})


def test_restore_scene_device_assembly_matches_host(model_and_vars):
    """device_assembly=True keeps gather/denoise/blend on device; it must
    reproduce the host-assembly result (same windows, weights, order)."""
    from msid_tpu.deployment.sliding_window import restore_scene

    model, variables = model_and_vars
    rng = np.random.default_rng(5)
    scene = rng.uniform(0, 10000, (112, 160, 13)).astype(np.float32)

    host = restore_scene(model, variables, scene,
                         window=64, overlap=16, model_size=64, batch_size=3)
    dev = restore_scene(model, variables, scene,
                        window=64, overlap=16, model_size=64, batch_size=3,
                        device_assembly=True)
    assert dev.shape == scene.shape and np.isfinite(dev).all()
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


def test_restore_scene_native_dtype_upload_bit_identical(model_and_vars):
    """A uint16 scene (raw Sentinel-2 DN, 2x fewer relay bytes than fp32)
    must produce results bit-identical to uploading the same values as
    fp32 — the uint16→fp32 cast in normalize_raw is exact."""
    from msid_tpu.deployment.sliding_window import restore_scene

    model, variables = model_and_vars
    rng = np.random.default_rng(7)
    scene_u16 = rng.integers(0, 10000, (96, 112, 13), dtype=np.uint16)

    as_f32 = restore_scene(model, variables, scene_u16.astype(np.float32),
                           window=64, overlap=16, model_size=64,
                           batch_size=3, device_assembly=True)
    as_u16 = restore_scene(model, variables, scene_u16,
                           window=64, overlap=16, model_size=64,
                           batch_size=3, device_assembly=True)
    np.testing.assert_array_equal(as_u16, as_f32)


def test_restore_scene_streaming_matches_device_path(model_and_vars):
    """Banded streaming restore (H2D/compute/D2H overlapped) must match
    the whole-scene device path: same window origins, same blend weights;
    only the accumulation grouping differs (float reorder ~1e-6)."""
    from msid_tpu.deployment.sliding_window import (
        restore_scene,
        restore_scene_streaming,
    )

    model, variables = model_and_vars
    rng = np.random.default_rng(11)
    # 200 rows, window 64 / stride 48 → origins [0, 48, 96, 136]: with 2
    # origin rows per band this exercises multiple bands, seam carry, AND
    # the irregular flush-bottom origin spacing.
    scene = rng.uniform(0, 10000, (200, 112, 13)).astype(np.float32)

    whole = restore_scene(model, variables, scene, window=64, overlap=16,
                          model_size=64, batch_size=3, device_assembly=True)
    seen = []
    streamed = restore_scene_streaming(
        model, variables, scene, window=64, overlap=16, model_size=64,
        batch_size=3, band_origin_rows=2, output_dtype=np.float32,
        progress=lambda done, total: seen.append((done, total)))
    assert streamed.shape == scene.shape and np.isfinite(streamed).all()
    np.testing.assert_allclose(streamed, whole, rtol=1e-5, atol=1e-5)
    assert seen[-1][0] == seen[-1][1]  # progress reached total windows

    # single-band degenerate case (no seam carry)
    one_band = restore_scene_streaming(
        model, variables, scene, window=64, overlap=16, model_size=64,
        batch_size=3, band_origin_rows=64, output_dtype=np.float32)
    np.testing.assert_allclose(one_band, whole, rtol=1e-5, atol=1e-5)


def test_restore_scene_streaming_uint16_fp16_and_step_reuse(model_and_vars):
    """The shipped streaming configuration: uint16 DN upload, fp16
    download, prebuilt step reused across scenes."""
    from msid_tpu.deployment.sliding_window import (
        make_device_scene_step,
        restore_scene,
        restore_scene_streaming,
    )

    model, variables = model_and_vars
    rng = np.random.default_rng(13)
    scene = rng.integers(0, 10000, (160, 96, 13), dtype=np.uint16)

    ref = restore_scene(model, variables, scene, window=64, overlap=16,
                        model_size=64, batch_size=3, device_assembly=True)
    step = make_device_scene_step(model, variables, window=64,
                                  model_size=64, overlap=16)
    for _ in range(2):  # step reuse: second call recompiles nothing
        out = restore_scene_streaming(
            model, variables, scene, window=64, overlap=16, model_size=64,
            batch_size=3, band_origin_rows=2, step=step)
        assert out.dtype == np.float16
        np.testing.assert_allclose(out, ref, atol=4e-3)

    # host-assembly step is rejected
    from msid_tpu.deployment.sliding_window import make_scene_step

    host_step = make_scene_step(model, variables, window=64, model_size=64)
    with pytest.raises(ValueError, match="assembly"):
        restore_scene_streaming(model, variables, scene, window=64,
                                overlap=16, model_size=64, step=host_step)


def test_restore_scene_streaming_undersized_scene(model_and_vars):
    """Scenes smaller than one window are edge-padded then cropped, as in
    restore_scene."""
    from msid_tpu.deployment.sliding_window import (
        restore_scene,
        restore_scene_streaming,
    )

    model, variables = model_and_vars
    rng = np.random.default_rng(17)
    scene = rng.uniform(0, 10000, (40, 50, 13)).astype(np.float32)
    ref = restore_scene(model, variables, scene, window=64, overlap=16,
                        model_size=64, batch_size=3, device_assembly=True)
    out = restore_scene_streaming(model, variables, scene, window=64,
                                  overlap=16, model_size=64, batch_size=3,
                                  output_dtype=np.float32)
    assert out.shape == scene.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_restore_scene_streaming_surfaces_worker_errors():
    """A failing compute step or downloader must RAISE promptly — a worker
    death must never leave the caller blocked on a bounded queue (the
    relay playbook treats a wedged client as kill-by-PID territory)."""
    import threading

    from msid_tpu.deployment import sliding_window as sw

    rng = np.random.default_rng(19)
    scene = rng.uniform(0, 10000, (200, 96, 13)).astype(np.float32)

    def run_guarded(fn):
        box = {}

        def target():
            try:
                fn()
                box["result"] = "returned"
            except Exception as e:
                box["error"] = e

        t = threading.Thread(target=target, daemon=True)
        t.start()
        t.join(timeout=60)
        assert not t.is_alive(), "restore_scene_streaming deadlocked"
        return box

    # --- compute-step failure: raises on the 2nd band so the uploader is
    # parked on its bounded put() at failure time.
    calls = {"n": 0}

    def boom_step(band, out_sum, w_sum, chunk, valid):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("synthetic step failure")
        return out_sum, w_sum

    boom_step.assembly = "device"
    box = run_guarded(lambda: sw.restore_scene_streaming(
        None, None, scene, window=64, overlap=16, model_size=64,
        batch_size=64, band_origin_rows=1, step=boom_step))
    assert "synthetic step failure" in str(box["error"])

    # --- downloader failure: device_get raising must re-raise after the
    # drain, not block the producer on a full download queue.
    def ok_step(band, out_sum, w_sum, chunk, valid):
        return out_sum, w_sum

    ok_step.assembly = "device"
    real_device_get = sw.jax.device_get
    sw.jax.device_get = lambda *_a, **_k: (_ for _ in ()).throw(
        RuntimeError("synthetic download failure"))
    try:
        box = run_guarded(lambda: sw.restore_scene_streaming(
            None, None, scene, window=64, overlap=16, model_size=64,
            batch_size=64, band_origin_rows=1, step=ok_step))
    finally:
        sw.jax.device_get = real_device_get
    assert "synthetic download failure" in str(box["error"])


def test_restore_scene_output_dtype(model_and_vars):
    """output_dtype=float16 halves the scene download; values must round
    to the fp32 result within half-precision ulp, on both paths."""
    from msid_tpu.deployment.sliding_window import restore_scene

    model, variables = model_and_vars
    rng = np.random.default_rng(9)
    scene = rng.uniform(0, 10000, (96, 96, 13)).astype(np.float32)

    kwargs = dict(window=64, overlap=16, model_size=64, batch_size=3)
    for device_assembly in (False, True):
        full = restore_scene(model, variables, scene,
                             device_assembly=device_assembly, **kwargs)
        half = restore_scene(model, variables, scene,
                             device_assembly=device_assembly,
                             output_dtype=np.float16, **kwargs)
        assert half.dtype == np.float16
        # model range ≈[-2,2]: fp16 relative error 2^-11 → atol ~2e-3
        np.testing.assert_allclose(half, full, atol=4e-3)


def test_scene_auto_falls_back_to_apply_for_fill_models():
    """Regression (round 5): `_make_scene_forward(optimize="auto")` on an
    input_fill model must fall back to `model.apply` — before the
    `optimize_for_hybrid` support gate it slipped into the hybrid graph
    and crashed at trace time with ScopeParamNotFoundError(fill_gram),
    which took `msid-restore` down on every fill-family checkpoint."""
    from msid_tpu.deployment.sliding_window import restore_scene

    model = SatMAERestoration(
        image_size=64, patch_size=16, embed_dim=96, depth=2, num_heads=4,
        decoder_channels=(48, 24, 12, 8), gradient_checkpointing=False,
        input_fill=True, residual_output=True,
    )
    variables = init_model(model, jax.random.PRNGKey(0))
    scene = np.random.default_rng(0).uniform(
        0, 10000, (96, 96, 13)).astype(np.uint16)
    out = restore_scene(model, variables, scene, window=64, overlap=16,
                        model_size=64, batch_size=4, device_assembly=True)
    assert out.shape == (96, 96, 13)
    assert np.isfinite(out).all()


def test_fastpath_rejects_fill_models_explicitly():
    """optimize_for_inference/optimize_for_hybrid must raise (not silently
    drop the fill prologue) for input_fill models."""
    import pytest as _pytest

    from msid_tpu.deployment.fastpath import (
        optimize_for_hybrid,
        optimize_for_inference,
    )

    model = SatMAERestoration(
        image_size=64, patch_size=16, embed_dim=96, depth=2, num_heads=4,
        decoder_channels=(48, 24, 12, 8), gradient_checkpointing=False,
        input_fill=True,
    )
    variables = init_model(model, jax.random.PRNGKey(0))
    with _pytest.raises(ValueError, match="input_fill"):
        optimize_for_inference(model, variables)
    with _pytest.raises(ValueError, match="input_fill"):
        optimize_for_hybrid(model, variables)
