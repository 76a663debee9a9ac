"""Scene-restoration CLI (scripts/restore.py) unit pieces.

The full CLI is driven end-to-end in the verify recipe; these cover the
IO helpers and the streaming auto-switch threshold.
"""

import numpy as np
import pytest

from scripts.restore import AUTO_STREAM_PIXELS, load_scene, save_scene


def test_scene_io_roundtrip_tiff_and_npy(tmp_path):
    rng = np.random.default_rng(3)
    scene = rng.integers(0, 10000, (40, 50, 13)).astype(np.uint16)

    tif = tmp_path / "s.tif"
    save_scene(str(tif), scene)
    np.testing.assert_array_equal(load_scene(str(tif)), scene)

    npy = tmp_path / "s.npy"
    save_scene(str(npy), scene.astype(np.float32))
    np.testing.assert_array_equal(load_scene(str(npy)),
                                  scene.astype(np.float32))

    # 2-D input gets a channel axis
    np.save(tmp_path / "g.npy", scene[:, :, 0])
    assert load_scene(str(tmp_path / "g.npy")).shape == (40, 50, 1)


def test_scene_io_roundtrip_float16_tiff(tmp_path):
    # --output-dtype float16 writes SampleFormat=3/16-bit TIFF; the
    # built-in reader must parse its own writer's half-float output.
    rng = np.random.default_rng(4)
    scene = rng.uniform(0, 1, (16, 24, 13)).astype(np.float16)
    tif = tmp_path / "h.tif"
    save_scene(str(tif), scene)
    back = load_scene(str(tif))
    assert back.dtype == np.float16
    np.testing.assert_array_equal(back, scene)


def test_reflectance_matches_device_from_model_range():
    # restore.py applies the inverse affine host-side (a full scene is GBs
    # and must not round-trip the device); pin it to the device formula.
    import jax.numpy as jnp

    from msid_tpu.ops.preprocess import from_model_range

    rng = np.random.default_rng(5)
    x = rng.uniform(-3.5, 3.5, (7, 9, 13)).astype(np.float32)
    host = np.clip(x.astype(np.float32) * 0.25 + 0.5, 0.0, 1.0)
    dev = np.asarray(from_model_range(jnp.asarray(x)))
    np.testing.assert_allclose(host, dev, atol=1e-7)


def test_scene_io_rejects_unknown_formats(tmp_path):
    with pytest.raises(SystemExit, match="unsupported input"):
        load_scene(str(tmp_path / "scene.jp2"))
    with pytest.raises(SystemExit, match="unsupported output"):
        save_scene(str(tmp_path / "scene.jp2"), np.zeros((4, 4, 2)))
    np.save(tmp_path / "bad.npy", np.zeros((2, 3, 4, 5)))
    with pytest.raises(SystemExit, match="H,W,C"):
        load_scene(str(tmp_path / "bad.npy"))


def test_auto_stream_threshold_is_relay_scale():
    # The auto switch must engage for real Sentinel-2 scenes (10980^2)
    # and stay off for benchmark-size tiles.
    assert 10980 * 10980 > AUTO_STREAM_PIXELS
    assert 1024 * 1024 < AUTO_STREAM_PIXELS
