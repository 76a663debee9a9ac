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


# ---------------- VGG16 perceptual (reference losses.py:205-277) ---------


def _torch_vgg16_features(params):
    """Plain-torch replica of torchvision vgg16().features through relu4_3,
    loaded with the SAME weights (HWIO → OIHW), as the golden reference."""
    import torch
    from torch import nn

    from msid_tpu.training.perceptual import VGG16_CHANNELS, VGG16_CONV_IDS

    modules = []
    cin = 3
    conv_iter = iter(zip(VGG16_CONV_IDS, VGG16_CHANNELS))
    next_conv, next_c = next(conv_iter)
    for idx in range(23):
        if idx == next_conv:
            conv = nn.Conv2d(cin, next_c, 3, padding=1)
            w = params[f"features.{idx}.weight"]
            conv.weight.data = torch.from_numpy(
                np.ascontiguousarray(w.transpose(3, 2, 0, 1)))
            conv.bias.data = torch.from_numpy(params[f"features.{idx}.bias"])
            modules.append(conv)
            cin = next_c
            next_conv, next_c = next(conv_iter, (None, None))
        elif idx in (4, 9, 16):
            modules.append(nn.MaxPool2d(2, 2))
        else:
            modules.append(nn.ReLU())
    return torch.nn.Sequential(*modules).eval()


def test_vgg_perceptual_golden_vs_torch():
    import torch

    from msid_tpu.training.perceptual import (
        init_vgg16_params,
        vgg_perceptual_loss,
        vgg_perceptual_per_sample,
    )

    params = init_vgg16_params(seed=3)
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (2, 32, 32, 13)).astype(np.float32)
    target = np.clip(pred + rng.normal(0, 0.05, pred.shape), 0, 1).astype(
        np.float32)

    got = float(vgg_perceptual_loss(params, jnp.asarray(pred),
                                    jnp.asarray(target)))

    vgg = _torch_vgg16_features(params)
    layer_ids = {3, 8, 15, 22}
    want = 0.0
    with torch.no_grad():
        yp = torch.from_numpy(pred[..., :3].transpose(0, 3, 1, 2))
        yt = torch.from_numpy(target[..., :3].transpose(0, 3, 1, 2))
        for idx, layer in enumerate(vgg):
            yp, yt = layer(yp), layer(yt)
            if idx in layer_ids:
                want += float(torch.mean((yp - yt) ** 2))
    assert got == pytest.approx(want, rel=2e-3)

    # per-sample decomposition: mean equals the scalar
    ps = vgg_perceptual_per_sample(params, jnp.asarray(pred),
                                   jnp.asarray(target))
    assert ps.shape == (2,)
    assert float(jnp.mean(ps)) == pytest.approx(got, rel=1e-5)


def test_resolve_perceptual_and_npz_roundtrip(tmp_path):
    from msid_tpu.training.perceptual import (
        init_vgg16_params,
        load_vgg16_weights,
        resolve_perceptual,
    )

    assert resolve_perceptual({}) == ("edge", None)
    impl, p = resolve_perceptual(
        {"perceptual_impl": "vgg", "perceptual_weights_path": "/nope.npz"})
    assert impl == "edge" and p is None  # graceful fallback, like the ref
    with pytest.raises(ValueError, match="perceptual_impl"):
        resolve_perceptual({"perceptual_impl": "resnet"})

    params = init_vgg16_params(seed=1)
    path = tmp_path / "vgg.npz"
    np.savez(path, **params)
    impl, loaded = resolve_perceptual(
        {"perceptual_impl": "vgg", "perceptual_weights_path": str(path)})
    assert impl == "vgg"
    for k, v in params.items():
        np.testing.assert_array_equal(np.asarray(loaded[k]), v)

    # torch OIHW state_dict form loads too (kernels transposed back)
    oihw = {
        k: (v.transpose(3, 2, 0, 1) if v.ndim == 4 else v)
        for k, v in params.items()
    }
    import torch

    pth = tmp_path / "vgg.pth"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in oihw.items()}, pth)
    loaded2 = load_vgg16_weights(pth)
    for k, v in params.items():
        np.testing.assert_array_equal(loaded2[k], v)


def test_combined_loss_vgg_path(pair):
    from msid_tpu.training.perceptual import init_vgg16_params

    clean, noisy = pair
    params = init_vgg16_params(seed=0)
    cfg = LossConfig(perceptual_weight=0.5, ssim_weight=0.0)
    total_vgg, aux = combined_loss(noisy, clean, cfg, vgg_params=params)
    total_edge, _ = combined_loss(noisy, clean, cfg)
    assert "perceptual" in aux
    assert float(total_vgg) != float(total_edge)
    from msid_tpu.training.losses import combined_loss_per_sample

    ps = combined_loss_per_sample(noisy, clean, cfg, vgg_params=params)
    assert float(jnp.mean(ps)) == pytest.approx(float(total_vgg), rel=1e-5)


# ---- SAM loss term (round 4: `training.loss.sam_weight`) ----


def test_sam_loss_matches_metric_value(pair):
    """sam_loss (radians, atan2 form) == the SAM metric (degrees, arccos
    form) up to unit conversion."""
    from msid_tpu.ops.metrics import calculate_sam
    from msid_tpu.training.losses import sam_loss

    clean, noisy = pair
    got_deg = float(sam_loss(noisy, clean)) * 180.0 / np.pi
    want_deg = float(calculate_sam(noisy, clean))
    assert got_deg == pytest.approx(want_deg, abs=1e-3)


def test_sam_loss_gradient_finite_at_perfect_prediction(pair):
    """The whole point of the atan2 form: at pred == target the arccos
    formulation has an infinite derivative; ours must be finite."""
    import jax

    from msid_tpu.training.losses import sam_loss

    clean, _ = pair
    g = jax.grad(lambda p: sam_loss(p, clean))(clean)
    assert np.all(np.isfinite(np.asarray(g)))


def test_sam_loss_golden_vs_torch(pair):
    """Value AND gradient parity against a torch autograd implementation
    of the reference SAM formula (metrics.py:124-172) at a generic
    (non-aligned) point, where both forms are smooth."""
    import jax
    import torch

    from msid_tpu.training.losses import sam_loss

    clean, noisy = pair
    p = torch.tensor(np.asarray(noisy), requires_grad=True, dtype=torch.float64)
    t = torch.tensor(np.asarray(clean), dtype=torch.float64)
    eps = 1e-8
    dot = (p * t).sum(dim=-1)
    pn = p.pow(2).sum(dim=-1).sqrt() + eps
    tn = t.pow(2).sum(dim=-1).sqrt() + eps
    angle = torch.arccos((dot / (pn * tn)).clamp(-1.0, 1.0))
    want = angle.mean(dim=(1, 2)).mean()
    want.backward()

    got = float(sam_loss(noisy, clean))
    assert got == pytest.approx(float(want), abs=1e-5)
    g = jax.grad(lambda q: sam_loss(q, clean))(noisy)
    np.testing.assert_allclose(
        np.asarray(g), p.grad.numpy(), rtol=1e-3, atol=1e-6)


def test_sam_weight_wired_into_combined(pair):
    from msid_tpu.training.losses import (
        combined_loss, combined_loss_per_sample, sam_loss,
    )

    clean, noisy = pair
    cfg = LossConfig(mse_weight=1.0, ssim_weight=0.1, sam_weight=0.05)
    total, aux = combined_loss(noisy, clean, cfg)
    base, _ = combined_loss(noisy, clean, LossConfig())
    assert float(total) == pytest.approx(
        float(base) + 0.05 * float(sam_loss(noisy, clean)), rel=1e-6)
    assert "sam_loss" in aux
    # per-sample decomposition stays exact
    ps = combined_loss_per_sample(noisy, clean, cfg)
    assert float(np.mean(np.asarray(ps))) == pytest.approx(float(total), rel=1e-5)


def test_sam_weight_from_config():
    cfg = LossConfig.from_config(
        {"training": {"loss": {"mse_weight": 1.0, "ssim_weight": 0.2,
                               "sam_weight": 0.1}}})
    assert cfg.sam_weight == pytest.approx(0.1)
    assert LossConfig.from_config({}).sam_weight == 0.0
