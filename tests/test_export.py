"""StableHLO export: artifact round-trip, dynamic batch, numerical parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msid_tpu.deployment.export import (
    compare_live_vs_exported,
    export_stablehlo,
    load_exported,
    make_inference_fn,
    verify_exported_model,
)
from msid_tpu.models import SatMAERestoration, init_model

SMALL = dict(
    image_size=64, patch_size=16, embed_dim=64, depth=1, num_heads=2,
    decoder_channels=(16, 8, 8, 8), gradient_checkpointing=False, norm="group",
)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    out = tmp_path_factory.mktemp("export") / "artifact"
    path = export_stablehlo(model, variables, out, input_shape=(1, 64, 64, 13))
    return model, variables, path


def test_artifact_layout_weights_not_baked(exported):
    """Weights live in params.npz; the module itself stays small (weights
    as constants would bloat it to the full parameter size)."""
    _, variables, path = exported
    assert (path / "module.stablehlo").exists()
    assert (path / "params.npz").exists()
    param_bytes = sum(
        np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(variables)
    )
    module_bytes = (path / "module.stablehlo").stat().st_size
    assert module_bytes < max(2_000_000, param_bytes // 2)


def test_verify_and_dynamic_batch(exported):
    _, _, path = exported
    assert verify_exported_model(path, input_shape=(1, 64, 64, 13),
                                 batch_sizes=(1, 3))


def test_numerical_parity(exported):
    model, variables, path = exported
    result = compare_live_vs_exported(model, variables, path,
                                      input_shape=(2, 64, 64, 13))
    assert result.allclose
    assert result.cosine_similarity > 0.999999


def test_roundtrip_matches_live(exported):
    model, variables, path = exported
    fn = load_exported(path)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 64, 64, 13)).astype(np.float32)
    )
    live = np.asarray(jax.jit(make_inference_fn(model))(variables, x))
    assert np.allclose(np.asarray(fn(x)), live, atol=1e-5)


# ---------------- inference session ----------------


def test_inference_session_predict_and_benchmark(exported):
    from msid_tpu.deployment.inference import InferenceSession

    model, variables, path = exported
    session = InferenceSession(model=model, variables=variables,
                               batch_size=2, image_size=64, num_bands=13)
    x = np.random.default_rng(0).normal(0, 1, (2, 64, 64, 13)).astype(np.float32)
    y = session.predict(x)
    assert y.shape == x.shape and np.isfinite(y).all()

    with pytest.raises(ValueError, match="4D"):
        session.predict(x[0])
    with pytest.raises(ValueError, match="batch"):
        session.predict(np.repeat(x, 2, axis=0))

    stats = session.benchmark(warmup_runs=1, benchmark_iterations=3)
    assert stats["mean_ms"] > 0 and stats["images_per_sec"] > 0

    # artifact-backed session
    s2 = InferenceSession(artifact_path=path, batch_size=1, image_size=64)
    y2 = s2.predict(x[:1])
    assert y2.shape == (1, 64, 64, 13)


def test_int8_artifact(tmp_path):
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    path = export_stablehlo(model, variables, tmp_path / "q",
                            input_shape=(1, 64, 64, 13), int8_weights=True)
    assert (path / "params_int8.npz").exists()
    assert not (path / "params.npz").exists()
    # int8 payload much smaller than fp32 would be
    import jax as _jax
    fp32 = sum(np.asarray(l).nbytes for l in _jax.tree_util.tree_leaves(variables))
    assert (path / "params_int8.npz").stat().st_size < fp32 / 2.5

    assert verify_exported_model(path, input_shape=(1, 64, 64, 13))
    result = compare_live_vs_exported(model, variables, path,
                                      input_shape=(2, 64, 64, 13),
                                      rtol=0.5, atol=0.5)
    # int8 weight rounding: outputs close but not exact
    assert result.cosine_similarity > 0.98


# ---------------- optimized (fastpath) artifact ----------------

OPT_SMALL = dict(
    image_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
    decoder_channels=(16, 16, 8, 8), gradient_checkpointing=False,
)  # fastpath needs the default unet_light + norm="batch"; 4 stages so the
# decoder's 2^4 upsampling of the 2x2 token grid restores the 32px input


@pytest.fixture(scope="module")
def exported_optimized(tmp_path_factory):
    model = SatMAERestoration(**OPT_SMALL, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0))
    out = tmp_path_factory.mktemp("export_opt") / "artifact"
    path = export_stablehlo(model, variables, out,
                            input_shape=(1, 32, 32, 13), optimize=True)
    return model, variables, path


def test_optimized_artifact_meta_and_layout(exported_optimized):
    import json

    _, _, path = exported_optimized
    meta = json.loads((path / "meta.json").read_text())
    assert meta["optimized"] is True
    assert meta["dtype"] == "float32"
    # the fastpath payload round-trips its nested lists (blocks#i keys)
    with np.load(path / "params.npz") as z:
        assert any("#" in k for k in z.files)
        assert any(k.startswith("blocks#0/") for k in z.files)


def test_optimized_artifact_parity_and_dynamic_batch(exported_optimized):
    model, variables, path = exported_optimized
    assert verify_exported_model(path, input_shape=(1, 32, 32, 13),
                                 batch_sizes=(1, 3))
    # fp32 model: the artifact must match model.apply tightly even though
    # the graph was rewritten (fused QKV, folded BN)
    result = compare_live_vs_exported(model, variables, path,
                                      input_shape=(2, 32, 32, 13),
                                      rtol=2e-3, atol=1e-4)
    assert result.cosine_similarity > 0.99999
    assert result.max_abs_diff < 1e-2


def test_optimized_session_from_artifact(exported_optimized):
    from msid_tpu.deployment.inference import InferenceSession

    _, _, path = exported_optimized
    s = InferenceSession(artifact_path=path, batch_size=1, image_size=32)
    x = np.random.default_rng(0).normal(0, 1, (1, 32, 32, 13)).astype(np.float32)
    y = s.predict(x)
    assert y.shape == x.shape and np.isfinite(y).all()


def test_optimized_rejects_int8_combo(tmp_path):
    model = SatMAERestoration(**OPT_SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="int8"):
        export_stablehlo(model, variables, tmp_path / "bad",
                         input_shape=(1, 32, 32, 13),
                         optimize=True, int8_weights=True)


def test_flatten_roundtrip_with_lists():
    from msid_tpu.deployment.export import (
        _flatten_variables,
        _unflatten_variables,
    )

    tree = {
        "a": np.arange(3.0),
        "blocks": [
            {"w": np.ones((2, 2)), "ln": [np.zeros(2), np.ones(2)]},
            {"w": np.full((2, 2), 2.0), "ln": [np.ones(2), np.zeros(2)]},
        ],
        "nested": {"stages": [{"res": [{"k": np.eye(2)}]}]},
    }
    flat = _flatten_variables(tree)
    back = _unflatten_variables(flat)
    la, lb = jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(back)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert isinstance(back["blocks"], list) and len(back["blocks"]) == 2
    assert isinstance(back["blocks"][0]["ln"], list)
    assert isinstance(back["nested"]["stages"][0]["res"], list)


def test_flatten_roundtrip_empty_list():
    """num_residual_blocks=0 gives stage['res'] == [] — must round-trip."""
    from msid_tpu.deployment.export import (
        _flatten_variables,
        _unflatten_variables,
    )

    tree = {"stages": [{"res": [], "w": np.ones(2)}], "top": []}
    back = _unflatten_variables(_flatten_variables(tree))
    assert back["stages"][0]["res"] == []
    assert back["top"] == []
    np.testing.assert_array_equal(np.asarray(back["stages"][0]["w"]), np.ones(2))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty dict"):
        _flatten_variables({"a": {}})


def test_tta_export_matches_live_ensemble(tmp_path):
    """A tta-exported artifact bakes the dihedral ensemble into the
    module; meta.json records it and the comparator ensembles its live
    side to match (exact parity, fp32)."""
    import json

    from msid_tpu.ops.tta import dihedral_ensemble

    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    path = export_stablehlo(model, variables, tmp_path / "tta",
                            input_shape=(1, 64, 64, 13), tta=4)
    meta = json.loads((path / "meta.json").read_text())
    assert meta["tta"] == 4

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-2, 2, (2, 64, 64, 13)).astype(np.float32)
    )
    infer = make_inference_fn(model)
    want = np.asarray(
        dihedral_ensemble(lambda z: infer(variables, z), x, 4)
    )
    got = np.asarray(load_exported(path)(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # and the artifact must NOT match the single-view forward
    assert not np.allclose(got, np.asarray(infer(variables, x)), atol=1e-4)

    result = compare_live_vs_exported(model, variables, path,
                                      input_shape=(2, 64, 64, 13))
    assert result.allclose


def test_optimized_export_unet_skip_roundtrip(tmp_path):
    """The unet_skip fastpath tree (stem list + per-stage fuse weights)
    must survive the flat npz serialization and match the live model."""
    model = SatMAERestoration(
        image_size=32, patch_size=16, embed_dim=64, depth=1, num_heads=4,
        decoder_arch="unet_skip", decoder_channels=(16, 8, 8, 8),
        gradient_checkpointing=False, dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0))
    path = export_stablehlo(model, variables, tmp_path / "skip_opt",
                            input_shape=(1, 32, 32, 13), optimize=True,
                            dynamic_batch=False)
    with np.load(path / "params.npz") as z:
        assert any(k.startswith("stem#0/") for k in z.files)
        assert any("fuse_w" in k for k in z.files)
    result = compare_live_vs_exported(model, variables, path,
                                      input_shape=(1, 32, 32, 13),
                                      rtol=2e-3, atol=1e-4)
    assert result.cosine_similarity > 0.99999
