"""Dihedral test-time self-ensemble (`msid_tpu.ops.tta`).

Covers the group algebra (inverse property, orbit distinctness), the
equivariance identity that makes TTA a no-op for symmetric operators,
eval-step integration (tta=1 is bit-identical to the plain step), and
the InferenceSession wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msid_tpu.ops.tta import (
    DIHEDRAL_ORBIT,
    dihedral_ensemble,
    dihedral_inverse,
    dihedral_transform,
    orbit_prefix,
)


def _rand(shape, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32, -1, 1)


@pytest.mark.parametrize("k,flip", DIHEDRAL_ORBIT)
def test_inverse_recovers_input(k, flip):
    x = _rand((2, 8, 8, 3))
    y = dihedral_inverse(dihedral_transform(x, k, flip), k, flip)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_orbit_elements_distinct():
    # A generic (asymmetric) input must map to 8 distinct views.
    x = _rand((1, 8, 8, 1), seed=3)
    views = [np.asarray(dihedral_transform(x, k, f)) for k, f in DIHEDRAL_ORBIT]
    for i in range(len(views)):
        for j in range(i + 1, len(views)):
            assert not np.array_equal(views[i], views[j])


def test_first_four_preserve_nonsquare_shapes():
    x = _rand((1, 4, 6, 2))
    for k, f in DIHEDRAL_ORBIT[:4]:
        assert dihedral_transform(x, k, f).shape == x.shape
    out = dihedral_ensemble(lambda z: z * 2.0, x, num_transforms=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, rtol=1e-6)
    with pytest.raises(ValueError):
        orbit_prefix(8, 4, 6)
    with pytest.raises(ValueError):
        orbit_prefix(0, 8, 8)


def test_ensemble_identity_for_equivariant_forward():
    # Pointwise forwards commute with every dihedral transform, so the
    # ensemble must equal the plain forward up to accumulation rounding.
    x = _rand((2, 8, 8, 13), seed=1)
    out = dihedral_ensemble(lambda z: jnp.tanh(z), x, num_transforms=8)
    np.testing.assert_allclose(np.asarray(out), np.tanh(np.asarray(x)),
                               rtol=1e-6, atol=1e-6)


def test_ensemble_averages_views():
    # For a non-equivariant forward the ensemble must equal the explicit
    # average of inverse-transformed per-view outputs.
    w = _rand((8, 8, 1), seed=5)

    def forward(z):
        return z * w  # spatially-varying gain: breaks equivariance

    x = _rand((1, 8, 8, 1), seed=6)
    got = dihedral_ensemble(forward, x, num_transforms=8)
    want = np.mean(
        [
            np.asarray(dihedral_inverse(forward(dihedral_transform(x, k, f)), k, f))
            for k, f in DIHEDRAL_ORBIT
        ],
        axis=0,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(got), np.asarray(forward(x)), atol=1e-3)


def _tiny_model():
    from msid_tpu.models import SatMAERestoration

    # 4 decoder stages = 16x upsample: output matches the 32x32 input.
    return SatMAERestoration(
        image_size=32,
        patch_size=16,
        embed_dim=64,
        depth=1,
        num_heads=4,
        decoder_channels=(16, 8, 8, 8),
        gradient_checkpointing=False,
        norm="group",
    )


def test_eval_step_tta_one_matches_plain():
    from msid_tpu.models import init_model
    from msid_tpu.training.train_state import make_eval_step

    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    batch = _rand((2, 32, 32, 13), seed=7) * 0.5 + 0.5
    key = jax.random.PRNGKey(9)
    count = jnp.int32(2)

    plain = make_eval_step(model, image_size=32)(variables, batch, key, count)
    same = make_eval_step(model, image_size=32, tta=1)(variables, batch, key, count)
    for name in plain:
        np.testing.assert_array_equal(np.asarray(plain[name]), np.asarray(same[name]))

    # tta=8 runs, produces finite sums, and actually changes the output.
    ens = make_eval_step(model, image_size=32, tta=8)(variables, batch, key, count)
    for name in ens:
        assert np.isfinite(np.asarray(ens[name])).all()
    assert not np.allclose(np.asarray(ens["psnr"]), np.asarray(plain["psnr"]))


def test_inference_session_tta_matches_manual_ensemble():
    from msid_tpu.deployment.inference import InferenceSession
    from msid_tpu.models import init_model

    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    x = np.asarray(_rand((2, 32, 32, 13), seed=11))

    plain = InferenceSession(model=model, variables=variables, batch_size=2,
                             image_size=32, optimize=False)
    tta = InferenceSession(model=model, variables=variables, batch_size=2,
                           image_size=32, optimize=False, tta=8)
    assert tta.tta == 8

    def forward(z):
        return model.apply(variables, z, train=False)

    want = np.asarray(dihedral_ensemble(forward, jnp.asarray(x), 8))
    got = tta.predict(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert not np.allclose(got, plain.predict(x), atol=1e-4)


def test_restore_scene_tta_host_device_parity():
    """tta threads through both scene-step builders: host and device
    assembly must agree under ensembling, and differ from tta=1."""
    from msid_tpu.deployment.sliding_window import restore_scene
    from msid_tpu.models import init_model

    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(13)
    scene = rng.uniform(0, 10000, (48, 40, 13)).astype(np.float32)

    kw = dict(window=32, overlap=8, model_size=32, batch_size=2)
    host = restore_scene(model, variables, scene, **kw, tta=2)
    dev = restore_scene(model, variables, scene, **kw, tta=2,
                        device_assembly=True)
    np.testing.assert_allclose(host, dev, atol=1e-4)
    plain = restore_scene(model, variables, scene, **kw)
    assert not np.allclose(host, plain, atol=1e-4)


def test_inference_session_tta_rejects_artifacts(tmp_path):
    from msid_tpu.deployment.inference import InferenceSession

    with pytest.raises(ValueError):
        InferenceSession(artifact_path=tmp_path / "missing.stablehlo", tta=8)


@pytest.mark.parametrize("bad", [0, -8, 9])
def test_invalid_tta_fails_fast_everywhere(bad):
    """tta=0 / negative / >8 must raise at BUILD time in every entry point
    (ADVICE r2: '--tta -8' silently ran single-view before)."""
    from msid_tpu.deployment.inference import InferenceSession
    from msid_tpu.models import init_model
    from msid_tpu.ops.tta import wrap_forward
    from msid_tpu.training.train_state import make_eval_step

    with pytest.raises(ValueError, match="num_transforms"):
        wrap_forward(lambda v, x: x, bad, 32, 32)

    model = _tiny_model()
    with pytest.raises(ValueError, match="num_transforms"):
        make_eval_step(model, image_size=32, tta=bad)

    variables = init_model(model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="num_transforms"):
        InferenceSession(model=model, variables=variables, batch_size=1,
                         image_size=32, optimize=False, tta=bad)


def test_export_invalid_tta_fails_fast(tmp_path):
    from msid_tpu.deployment.export import export_stablehlo
    from msid_tpu.models import init_model

    model = _tiny_model()
    variables = init_model(model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="num_transforms"):
        export_stablehlo(model, variables, tmp_path / "m",
                         input_shape=(1, 32, 32, 13), tta=0)
