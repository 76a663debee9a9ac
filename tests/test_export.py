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
