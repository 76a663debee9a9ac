"""Fastpath (inference graph optimization) parity tests.

The fastpath rewrites trained weights host-side (fused QKV, folded BN,
upsample-as-matmul) and runs a hand-scheduled forward; it must match
`model.apply(..., train=False)` numerically. Mirrors the role of the
reference's PyTorch-vs-ONNX comparator (export_onnx.py:172-271) for its
graph-simplified artifact (optimize_model.py:16-75).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msid_tpu.deployment.fastpath import make_fast_inference_fn, optimize_for_inference
from msid_tpu.models import SatMAERestoration, init_model


def _tiny_model(**kw):
    defaults = dict(
        image_size=32,
        patch_size=16,
        embed_dim=64,
        depth=2,
        num_heads=4,
        decoder_channels=(32, 16),
        gradient_checkpointing=False,
    )
    defaults.update(kw)
    return SatMAERestoration(**defaults)


def _random_stats(variables, key):
    """Perturb batch_stats away from init (mean 0 / var 1) so BN folding is
    actually exercised."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, leaf in zip(keys, leaves):
        out.append(leaf + jax.random.uniform(k, leaf.shape, leaf.dtype, 0.01, 0.2))
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("matmul_upsample", [True, False])
def test_fastpath_matches_model_fp32(matmul_upsample):
    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    variables = dict(variables)
    variables["batch_stats"] = _random_stats(
        variables["batch_stats"], jax.random.PRNGKey(1)
    )

    x = jax.random.uniform(
        jax.random.PRNGKey(2), (2, 32, 32, 13), jnp.float32, -2.0, 2.0
    )
    ref = np.asarray(model.apply(variables, x, train=False))

    fp = optimize_for_inference(model, variables, dtype=jnp.float32)
    fn = make_fast_inference_fn(model, matmul_upsample=matmul_upsample)
    got = np.asarray(jax.jit(fn)(fp, x))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_fastpath_bf16_close_to_fp32():
    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (1, 32, 32, 13), jnp.float32, -2.0, 2.0
    )
    ref = np.asarray(model.apply(variables, x, train=False))
    fp = optimize_for_inference(model, variables, dtype=jnp.bfloat16)
    got = np.asarray(jax.jit(make_fast_inference_fn(model))(fp, x))
    # bf16 has ~3 decimal digits; outputs live in [-3, 3]
    assert np.max(np.abs(got - ref)) < 0.15
    cos = np.dot(got.ravel(), ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12
    )
    assert cos > 0.999


def test_fastpath_flagship_shapes():
    """Full-size geometry (depth trimmed for CPU test budget)."""
    model = SatMAERestoration(depth=1, gradient_checkpointing=False)
    variables = init_model(model, jax.random.PRNGKey(0))
    fp = optimize_for_inference(model, variables, dtype=jnp.float32)
    x = jnp.zeros((1, 192, 192, 13), jnp.float32)
    y = jax.jit(make_fast_inference_fn(model))(fp, x)
    assert y.shape == (1, 192, 192, 13)
    ref = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-5)


def test_hybrid_matches_model_fp32():
    """The hybrid large-batch path (flax encoder + folded-BN ct decoder)
    must match model.apply numerically — only the decoder is rewritten."""
    from msid_tpu.deployment.fastpath import (
        make_hybrid_inference_fn,
        optimize_for_hybrid,
    )

    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    variables = dict(variables)
    variables["batch_stats"] = _random_stats(
        variables["batch_stats"], jax.random.PRNGKey(1)
    )
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (3, 32, 32, 13), jnp.float32, -2.0, 2.0
    )
    ref = np.asarray(model.apply(variables, x, train=False))
    w = optimize_for_hybrid(model, variables, dtype=jnp.float32)
    got = np.asarray(jax.jit(make_hybrid_inference_fn(model))(w, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_fastpath_rejects_unsupported():
    model = _tiny_model(decoder_arch="unet")
    variables = init_model(model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        optimize_for_inference(model, variables)


def test_session_auto_gates_fastpath_by_batch():
    """optimize="auto" picks the full fastpath in its measured win region
    (small batch, launch-bound) and the hybrid (flax encoder + folded
    decoder) above it."""
    from msid_tpu.deployment.inference import InferenceSession

    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))

    small = InferenceSession(model=model, variables=variables,
                             batch_size=1, image_size=32)
    assert small.optimized == "fastpath"

    big = InferenceSession(model=model, variables=variables,
                           batch_size=8, image_size=32)
    assert big.optimized == "hybrid"

    forced = InferenceSession(model=model, variables=variables,
                              batch_size=8, image_size=32, optimize=True)
    assert forced.optimized == "fastpath"

    x = np.random.default_rng(0).normal(0, 1, (1, 32, 32, 13)).astype(np.float32)
    ya = small.predict(x)
    yb = big.predict(np.repeat(x, 8, axis=0))
    np.testing.assert_allclose(ya[0], yb[0], rtol=2e-4, atol=2e-5)


def test_session_optimize_true_raises_on_unsupported():
    from msid_tpu.deployment.inference import InferenceSession

    model = _tiny_model(decoder_arch="unet")
    variables = init_model(model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        InferenceSession(model=model, variables=variables,
                         batch_size=1, image_size=32, optimize=True)
    # "auto" silently falls back
    s = InferenceSession(model=model, variables=variables,
                         batch_size=1, image_size=32)
    assert not s.optimized
