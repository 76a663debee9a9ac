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
