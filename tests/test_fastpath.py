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
    """optimize="auto" serves each batch regime's measured winner
    (outputs/r4_checks/fastpath_ab.log): plain `model.apply` below the
    hybrid crossover — the full fastpath lost its small-batch edge on
    the current toolchain — and the hybrid (flax encoder + folded
    decoder) from HYBRID_AUTO_MIN_BATCH up."""
    from msid_tpu.deployment.inference import (
        HYBRID_AUTO_MIN_BATCH, InferenceSession,
    )

    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))

    small = InferenceSession(model=model, variables=variables,
                             batch_size=1, image_size=32)
    assert small.optimized is False

    big = InferenceSession(model=model, variables=variables,
                           batch_size=HYBRID_AUTO_MIN_BATCH, image_size=32)
    assert big.optimized == "hybrid"

    forced = InferenceSession(model=model, variables=variables,
                              batch_size=8, image_size=32, optimize=True)
    assert forced.optimized == "fastpath"

    x = np.random.default_rng(0).normal(0, 1, (1, 32, 32, 13)).astype(np.float32)
    ya = small.predict(x)
    yb = big.predict(np.repeat(x, HYBRID_AUTO_MIN_BATCH, axis=0))
    yc = forced.predict(np.repeat(x, 8, axis=0))
    np.testing.assert_allclose(ya[0], yb[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ya[0], yc[0], rtol=2e-4, atol=2e-5)


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


def test_device_fold_matches_host_fold_fp32():
    """fold_decoder_jnp (in-jit fold) must produce the same folded tree as
    the host-numpy optimize_for_hybrid path."""
    from msid_tpu.deployment.fastpath import fold_decoder_jnp, optimize_for_hybrid

    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    variables = dict(variables)
    variables["batch_stats"] = _random_stats(
        variables["batch_stats"], jax.random.PRNGKey(1)
    )
    host = optimize_for_hybrid(model, variables, dtype=jnp.float32)["dec"]
    dev = jax.jit(lambda v: fold_decoder_jnp(
        v["params"]["decoder"], v["batch_stats"]["decoder"],
        num_stages=len(model.decoder_channels), dtype=jnp.float32))(variables)
    flat_h = {"/".join(map(str, p)): np.asarray(a) for p, a in
              jax.tree_util.tree_flatten_with_path(host)[0]}
    flat_d = {"/".join(map(str, p)): np.asarray(a) for p, a in
              jax.tree_util.tree_flatten_with_path(dev)[0]}
    assert set(flat_h) == set(flat_d)
    for name in flat_h:
        np.testing.assert_allclose(flat_d[name], flat_h[name],
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_eval_step_hybrid_matches_apply_fp32():
    """make_eval_step(forward_impl='hybrid') must reproduce the 'apply'
    metrics on a fp32 batch-norm model to numerical tolerance (VERDICT r2
    weak #3: validation should score the deploy graph)."""
    from msid_tpu.training.train_state import make_eval_step

    # 4 upsample stages so the decoder output matches the 32x32 input
    model = _tiny_model(decoder_channels=(16, 8, 8, 8))
    variables = init_model(model, jax.random.PRNGKey(0))
    variables = dict(variables)
    variables["batch_stats"] = _random_stats(
        variables["batch_stats"], jax.random.PRNGKey(1)
    )
    batch = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 13),
                               jnp.float32, 0.0, 10000.0)
    key = jax.random.PRNGKey(7)
    count = jnp.int32(4)

    plain = make_eval_step(model, image_size=32, forward_impl="apply")(
        variables, batch, key, count)
    hybrid = make_eval_step(model, image_size=32, forward_impl="hybrid")(
        variables, batch, key, count)
    auto = make_eval_step(model, image_size=32, forward_impl="auto")(
        variables, batch, key, count)
    for name in plain:
        np.testing.assert_allclose(np.asarray(hybrid[name]),
                                   np.asarray(plain[name]),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
        # "auto" resolves to "apply" (the hybrid eval step measured slower
        # on v5e — see make_eval_step docstring), so auto == plain exactly.
        np.testing.assert_array_equal(np.asarray(auto[name]),
                                      np.asarray(plain[name]))


def test_eval_step_auto_falls_back_for_group_norm():
    """auto must quietly use model.apply for unsupported configs; explicit
    'hybrid' must raise."""
    from msid_tpu.training.train_state import make_eval_step

    model = _tiny_model(norm="group", decoder_channels=(16, 8, 8, 8))
    variables = init_model(model, jax.random.PRNGKey(0))
    batch = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 13),
                               jnp.float32, 0.0, 10000.0)
    out = make_eval_step(model, image_size=32, forward_impl="auto")(
        variables, batch, jax.random.PRNGKey(1), jnp.int32(2))
    assert np.isfinite(np.asarray(out["psnr"]))
    with pytest.raises(ValueError, match="hybrid"):
        make_eval_step(model, image_size=32, forward_impl="hybrid")
    with pytest.raises(ValueError, match="forward_impl"):
        make_eval_step(model, image_size=32, forward_impl="bogus")


# ---- unet_skip graph family (round 3: the quality-winning decoder must
# ---- serve through the same optimized graphs as unet_light) ----

def _skip_model(**kw):
    """Tiny unet_skip config: 4 stages so grid 2 upsamples back to 32."""
    return _tiny_model(decoder_arch="unet_skip",
                       decoder_channels=(16, 8, 8, 8), **kw)


@pytest.mark.parametrize("matmul_upsample", [True, False])
def test_fastpath_skip_matches_model_fp32(matmul_upsample):
    model = _skip_model()
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
    assert "stem" in fp and "fuse_w" in fp["stages"][0]
    fn = make_fast_inference_fn(model, matmul_upsample=matmul_upsample)
    got = np.asarray(jax.jit(fn)(fp, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_hybrid_skip_matches_model_fp32():
    from msid_tpu.deployment.fastpath import (
        make_hybrid_inference_fn,
        optimize_for_hybrid,
    )

    model = _skip_model()
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


def test_device_fold_skip_matches_apply_fp32():
    """make_hybrid_forward (in-jit fold, used by eval forward_impl=auto)
    must match model.apply for unet_skip."""
    from msid_tpu.deployment.fastpath import make_hybrid_forward

    model = _skip_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    variables = dict(variables)
    variables["batch_stats"] = _random_stats(
        variables["batch_stats"], jax.random.PRNGKey(1)
    )
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (2, 32, 32, 13), jnp.float32, -2.0, 2.0
    )
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(jax.jit(make_hybrid_forward(model))(variables, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_eval_step_hybrid_matches_apply_for_skip():
    """Opt-in forward_impl='hybrid' must reproduce the 'apply' metrics for
    the unet_skip decoder (auto resolves to apply — measured faster in the
    full eval step on v5e, see make_eval_step)."""
    from msid_tpu.training.train_state import make_eval_step

    model = _skip_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    variables = dict(variables)
    variables["batch_stats"] = _random_stats(
        variables["batch_stats"], jax.random.PRNGKey(1)
    )
    batch = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 13),
                               jnp.float32, 0.0, 10000.0)
    key = jax.random.PRNGKey(7)
    count = jnp.int32(4)
    plain = make_eval_step(model, image_size=32, forward_impl="apply")(
        variables, batch, key, count)
    hybrid = make_eval_step(model, image_size=32, forward_impl="hybrid")(
        variables, batch, key, count)
    auto = make_eval_step(model, image_size=32, forward_impl="auto")(
        variables, batch, key, count)
    for name in plain:
        np.testing.assert_allclose(np.asarray(hybrid[name]),
                                   np.asarray(plain[name]),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
        np.testing.assert_array_equal(np.asarray(auto[name]),
                                      np.asarray(plain[name]))


def test_session_auto_optimizes_skip():
    """InferenceSession auto-selection for unet_skip follows the same
    measured policy (apply below the hybrid crossover, hybrid above) and
    the explicit fastpath agrees numerically."""
    from msid_tpu.deployment.inference import InferenceSession

    model = _skip_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    small = InferenceSession(model=model, variables=variables,
                             batch_size=1, image_size=32)
    assert small.optimized is False
    forced = InferenceSession(model=model, variables=variables,
                              batch_size=1, image_size=32, optimize=True)
    assert forced.optimized == "fastpath"
    big = InferenceSession(model=model, variables=variables,
                           batch_size=8, image_size=32)
    assert big.optimized == "hybrid"
    x = np.random.default_rng(0).normal(0, 1, (1, 32, 32, 13)).astype(np.float32)
    ya = small.predict(x)
    yb = big.predict(np.repeat(x, 8, axis=0))
    yc = forced.predict(x)
    np.testing.assert_allclose(ya[0], yb[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ya[0], yc[0], rtol=2e-4, atol=2e-5)


# ---- global residual head (round 3: `model.decoder.residual: true`) ----

def test_residual_graphs_match_model_fp32():
    """All three optimized graphs (fastpath, hybrid, in-jit fold) must
    carry the global residual add exactly like model.apply."""
    from msid_tpu.deployment.fastpath import (
        make_hybrid_forward,
        make_hybrid_inference_fn,
        optimize_for_hybrid,
    )

    model = _skip_model(residual_output=True)
    variables = init_model(model, jax.random.PRNGKey(0))
    variables = dict(variables)
    variables["batch_stats"] = _random_stats(
        variables["batch_stats"], jax.random.PRNGKey(1)
    )
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (2, 32, 32, 13), jnp.float32, -2.0, 2.0
    )
    ref = np.asarray(model.apply(variables, x, train=False))

    # the flag must actually be wired in (not a no-op): same params without
    # the residual differ by exactly the input
    plain = _skip_model(residual_output=False)
    base = np.asarray(plain.apply(variables, x, train=False))
    np.testing.assert_allclose(ref, base + np.asarray(x), rtol=1e-6, atol=1e-6)

    fp = optimize_for_inference(model, variables, dtype=jnp.float32)
    got_fast = np.asarray(jax.jit(make_fast_inference_fn(model))(fp, x))
    np.testing.assert_allclose(got_fast, ref, rtol=2e-4, atol=2e-5)

    w = optimize_for_hybrid(model, variables, dtype=jnp.float32)
    got_hyb = np.asarray(jax.jit(make_hybrid_inference_fn(model))(w, x))
    np.testing.assert_allclose(got_hyb, ref, rtol=2e-4, atol=2e-5)

    got_fold = np.asarray(jax.jit(make_hybrid_forward(model))(variables, x))
    np.testing.assert_allclose(got_fold, ref, rtol=2e-4, atol=2e-5)
