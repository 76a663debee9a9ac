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
