"""Metric parity tests: msid_tpu on-device reductions vs the reference
formulas re-evaluated with torch CPU (golden source, NCHW)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msid_tpu.ops import metrics as M
from msid_tpu.ops.ssim import ssim as jssim

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_psnr(pred, target, data_range=6.0):
    mse = F.mse_loss(pred, target).item()
    return 10 * np.log10(data_range**2 / mse)


def _torch_ssim(pred, target, data_range=6.0, window_size=11):
    # Direct re-evaluation of reference metrics.py:49-121.
    B, C, H, W = pred.shape

    def gaussian_window(size, sigma=1.5):
        x = torch.arange(size).float() - size // 2
        g = torch.exp(-(x**2) / (2 * sigma**2))
        return g / g.sum()

    _1d = gaussian_window(window_size)
    _2d = _1d.unsqueeze(1).mm(_1d.unsqueeze(0))
    window = _2d.unsqueeze(0).unsqueeze(0).expand(C, 1, window_size, window_size)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu1 = F.conv2d(pred, window, padding=window_size // 2, groups=C)
    mu2 = F.conv2d(target, window, padding=window_size // 2, groups=C)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(pred**2, window, padding=window_size // 2, groups=C) - mu1_sq
    s2 = F.conv2d(target**2, window, padding=window_size // 2, groups=C) - mu2_sq
    s12 = F.conv2d(pred * target, window, padding=window_size // 2, groups=C) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return ssim_map.mean().item()


def _torch_sam(pred, target, eps=1e-8):
    B, C, H, W = pred.shape
    p = pred.permute(0, 2, 3, 1).reshape(-1, C)
    t = target.permute(0, 2, 3, 1).reshape(-1, C)
    dot = (p * t).sum(dim=1)
    cos = dot / ((torch.norm(p, dim=1) + eps) * (torch.norm(t, dim=1) + eps))
    return torch.rad2deg(torch.acos(torch.clamp(cos, -1, 1))).mean().item()


@pytest.fixture
def pair(rng):
    clean = rng.uniform(-2, 2, size=(4, 13, 32, 32)).astype(np.float32)
    noisy = clean + rng.normal(0, 0.1, size=clean.shape).astype(np.float32)
    return clean, noisy


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_psnr_parity(pair):
    clean, noisy = pair
    got = float(M.calculate_psnr(_nhwc(noisy), _nhwc(clean)))
    want = _torch_psnr(torch.from_numpy(noisy), torch.from_numpy(clean))
    assert abs(got - want) < 1e-3


def test_ssim_parity(pair):
    clean, noisy = pair
    got = float(jssim(_nhwc(noisy), _nhwc(clean)))
    want = _torch_ssim(torch.from_numpy(noisy), torch.from_numpy(clean))
    assert abs(got - want) < 1e-4


def test_sam_parity(pair):
    clean, noisy = pair
    got = float(M.calculate_sam(_nhwc(noisy), _nhwc(clean)))
    want = _torch_sam(torch.from_numpy(noisy), torch.from_numpy(clean))
    assert abs(got - want) < 1e-3


def test_rmse_mae_parity(pair):
    clean, noisy = pair
    got_rmse = float(M.calculate_rmse(_nhwc(noisy), _nhwc(clean)))
    got_mae = float(M.calculate_mae(_nhwc(noisy), _nhwc(clean)))
    want_rmse = float(np.sqrt(np.mean((noisy - clean) ** 2)))
    want_mae = float(np.mean(np.abs(noisy - clean)))
    assert abs(got_rmse - want_rmse) < 1e-5
    assert abs(got_mae - want_mae) < 1e-5


def test_identical_inputs():
    x = jnp.ones((1, 8, 8, 13))
    assert float(M.calculate_psnr(x, x)) > 100  # ~inf guarded by eps
    assert float(M.calculate_ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    assert float(M.calculate_sam(x, x)) == pytest.approx(0.0, abs=1e-2)


def test_tracker_matches_per_sample_mean(pair):
    """Tracker must average per-sample metrics like the reference tracker
    (metrics.py:247-256), not pool statistics across the batch."""
    clean, noisy = pair
    tracker = M.MetricsTracker()
    tracker.update(_nhwc(noisy), _nhwc(clean))
    out = tracker.compute()

    per_sample_psnr = [
        _torch_psnr(torch.from_numpy(noisy[i : i + 1]), torch.from_numpy(clean[i : i + 1]))
        for i in range(clean.shape[0])
    ]
    assert out["psnr"] == pytest.approx(float(np.mean(per_sample_psnr)), abs=1e-3)

    per_sample_ssim = [
        _torch_ssim(torch.from_numpy(noisy[i : i + 1]), torch.from_numpy(clean[i : i + 1]))
        for i in range(clean.shape[0])
    ]
    assert out["ssim"] == pytest.approx(float(np.mean(per_sample_ssim)), abs=1e-4)


def test_tracker_accumulates_across_batches(pair):
    clean, noisy = pair
    t_all = M.MetricsTracker()
    t_all.update(_nhwc(noisy), _nhwc(clean))
    t_split = M.MetricsTracker()
    t_split.update(_nhwc(noisy[:2]), _nhwc(clean[:2]))
    t_split.update(_nhwc(noisy[2:]), _nhwc(clean[2:]))
    a, b = t_all.compute(), t_split.compute()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-5)
