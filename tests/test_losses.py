"""Loss parity vs the reference CombinedLoss formula (losses.py:16-189)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msid_tpu.training.losses import (
    LossConfig,
    combined_loss,
    edge_perceptual_loss,
    l1_loss,
    mse_loss,
    ssim_loss,
)


@pytest.fixture
def pair(rng):
    clean = rng.uniform(-2, 2, size=(2, 13, 48, 48)).astype(np.float32)
    noisy = clean + rng.normal(0, 0.2, size=clean.shape).astype(np.float32)
    return jnp.asarray(np.transpose(clean, (0, 2, 3, 1))), jnp.asarray(
        np.transpose(noisy, (0, 2, 3, 1))
    )


def test_combined_loss_formula(pair):
    clean, noisy = pair
    cfg = LossConfig(mse_weight=1.0, ssim_weight=0.1)
    total, aux = combined_loss(noisy, clean, cfg)
    want = float(mse_loss(noisy, clean)) + 0.1 * float(ssim_loss(noisy, clean))
    assert float(total) == pytest.approx(want, rel=1e-6)
    assert set(aux) == {"mse", "ssim_loss", "total"}


def test_combined_loss_torch_parity(pair):
    """Against a direct torch re-evaluation of reference losses.py."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    clean, noisy = pair
    t_clean = torch.from_numpy(np.transpose(np.asarray(clean), (0, 3, 1, 2)))
    t_noisy = torch.from_numpy(np.transpose(np.asarray(noisy), (0, 3, 1, 2)))

    def torch_ssim(img1, img2, data_range=6.0, ws=11):
        C = img1.shape[1]
        x = torch.arange(ws).float() - ws // 2
        g = torch.exp(-(x**2) / (2 * 1.5**2))
        g = g / g.sum()
        w = (g.unsqueeze(1).mm(g.unsqueeze(0))).unsqueeze(0).unsqueeze(0).expand(C, 1, ws, ws)
        c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        mu1 = F.conv2d(img1, w, padding=ws // 2, groups=C)
        mu2 = F.conv2d(img2, w, padding=ws // 2, groups=C)
        s1 = F.conv2d(img1 * img1, w, padding=ws // 2, groups=C) - mu1**2
        s2 = F.conv2d(img2 * img2, w, padding=ws // 2, groups=C) - mu2**2
        s12 = F.conv2d(img1 * img2, w, padding=ws // 2, groups=C) - mu1 * mu2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
        return m.mean()

    want = F.mse_loss(t_noisy, t_clean) + 0.1 * (1 - torch_ssim(t_noisy, t_clean))
    got, _ = combined_loss(noisy, clean, LossConfig())
    assert float(got) == pytest.approx(float(want), abs=1e-5)


def test_perfect_prediction_zero_loss():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 13)).astype(np.float32))
    total, aux = combined_loss(x, x, LossConfig())
    assert float(total) == pytest.approx(0.0, abs=1e-5)


def test_l1(pair):
    clean, noisy = pair
    want = float(np.mean(np.abs(np.asarray(noisy) - np.asarray(clean))))
    assert float(l1_loss(noisy, clean)) == pytest.approx(want, rel=1e-5)


def test_edge_perceptual_nonneg_and_zero_on_match(pair):
    clean, noisy = pair
    assert float(edge_perceptual_loss(clean, clean)) == pytest.approx(0.0, abs=1e-8)
    assert float(edge_perceptual_loss(noisy, clean)) > 0


def test_perceptual_weight_wired(pair):
    clean, noisy = pair
    cfg = LossConfig(perceptual_weight=0.5)
    total, aux = combined_loss(noisy, clean, cfg)
    assert "perceptual" in aux
    base, _ = combined_loss(noisy, clean, LossConfig())
    assert float(total) > float(base)


def test_loss_config_from_config():
    cfg = LossConfig.from_config(
        {"training": {"loss": {"mse_weight": 2.0, "ssim_weight": 0.15}}}
    )
    assert cfg.mse_weight == 2.0
    assert cfg.ssim_weight == 0.15
    assert cfg.perceptual_weight == 0.0


def test_bf16_inputs_fp32_loss(pair):
    clean, noisy = pair
    total, _ = combined_loss(noisy.astype(jnp.bfloat16), clean.astype(jnp.bfloat16))
    assert total.dtype == jnp.float32
    ref, _ = combined_loss(noisy, clean)
    assert float(total) == pytest.approx(float(ref), rel=2e-2)
