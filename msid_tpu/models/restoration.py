"""Composite restoration model: SatMAE ViT encoder + CNN decoder.

Capability parity with the reference composite
(`/root/reference/src/models/satmae_restoration.py:22-313`): encode the
noisy NHWC tile to [B, 144, 768] patch features, fold the token grid back
to spatial [B, 12, 12, 768] (NHWC — the reference's transpose+reshape to
NCHW at satmae_restoration.py:112-135 is unnecessary here), decode to
[B, 192, 192, 13]. Also provides config-driven construction and a
parameter-count breakdown (satmae_restoration.py:137-165).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from msid_tpu.models.decoder import DECODER_REGISTRY
from msid_tpu.models.encoder import SatMAEEncoder

Dtype = Any

# ViT family presets selectable via `model.encoder.name` (the reference
# only instantiates satmae_vit_base, encoder.py:73-134; small/large are
# the standard ViT scaling ladder for the TPU build).
ENCODER_PRESETS = {
    "satmae_vit_small": dict(embed_dim=384, depth=12, num_heads=6),
    "satmae_vit_base": dict(embed_dim=768, depth=12, num_heads=12),
    "satmae_vit_large": dict(embed_dim=1024, depth=24, num_heads=16),
}


class SatMAERestoration(nn.Module):
    """Flagship model: 13-band noisy tile in, restored tile out (NHWC)."""

    image_size: int = 192
    patch_size: int = 16
    in_channels: int = 13
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    decoder_arch: str = "unet_light"
    decoder_channels: Sequence[int] = (384, 192, 96, 48)
    out_channels: int = 13
    norm: str = "batch"
    # Global residual head: predict a correction to the noisy input instead
    # of reconstructing from scratch (`model.decoder.residual: true`).
    # Motivated by the floor study (docs/DESIGN.md §10): identity scores
    # 50.35 dB on dead-band-free tiles while reconstruction through the
    # token grid caps far lower — the residual makes identity free and
    # spends all capacity on noise/dead-band correction (DnCNN-style).
    residual_output: bool = False
    # Dead-band-aware input stage (`model.input_fill.enabled`, ops/fill.py):
    # detect killed bands from the input's per-channel RMS (no oracle),
    # replace them with the best linear cross-band prediction under the
    # train-fit Gram matrix (the `fill_gram` param — identity until
    # `setup_helpers` fits it, so an unfitted model behaves exactly like a
    # fill-less one), and condition the encoder on the detected mask via a
    # zero-init Dense. With `residual_output` the identity then scores the
    # measured 46.4-dB zero-skill floor (docs/DESIGN.md §10) at init and
    # all capacity goes to improving on it.
    input_fill: bool = False
    fill_rms_thresh: float = 0.05
    gradient_checkpointing: bool = True
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        if self.residual_output and self.out_channels != self.in_channels:
            raise ValueError(
                "residual output requires out_channels == in_channels, got "
                f"{self.out_channels} != {self.in_channels}")
        if self.input_fill and self.out_channels != self.in_channels:
            raise ValueError(
                "input_fill requires out_channels == in_channels, got "
                f"{self.out_channels} != {self.in_channels}")
        if self.input_fill:
            self.fill_gram = self.param(
                "fill_gram", lambda key, shape: jnp.eye(shape[0], dtype=jnp.float32),
                (self.in_channels + 1, self.in_channels + 1))
            # Mask conditioning: zero-init so the pretrained/converted
            # encoder forward is bit-unchanged at init.
            self.mask_cond = nn.Dense(
                self.embed_dim, kernel_init=nn.initializers.zeros,
                dtype=jnp.float32, name="mask_cond")
        self.encoder = SatMAEEncoder(
            image_size=self.image_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            gradient_checkpointing=self.gradient_checkpointing,
            dtype=self.dtype,
        )
        decoder_cls = DECODER_REGISTRY[self.decoder_arch]
        decoder_kwargs = dict(
            channels=tuple(self.decoder_channels),
            out_channels=self.out_channels,
            norm=self.norm,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )
        if self.residual_output and self.decoder_arch in ("unet_light", "unet_skip"):
            # Under a residual head, start as the exact identity: the
            # decoder's final conv is zero-init so output = input at step 0.
            decoder_kwargs["zero_init_head"] = True
        self.decoder = decoder_cls(**decoder_kwargs)
        if self.decoder_arch == "unet_skip":
            # Skip stem: multi-scale features of the raw input bypass the
            # token-grid bottleneck (see models/decoder.py InputPyramid —
            # motivated by the measured reconstruction-fidelity cap,
            # docs/DESIGN.md §10).
            from msid_tpu.models.decoder import InputPyramid

            self.skip_stem = InputPyramid(
                num_levels=len(self.decoder_channels),
                norm=self.norm,
                dtype=self.dtype,
                axis_name=self.axis_name,
            )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        assert h == self.image_size and w == self.image_size, (
            f"expected {self.image_size}x{self.image_size}, got {h}x{w}"
        )
        assert c == self.in_channels, f"expected {self.in_channels} bands, got {c}"

        cond = None
        if self.input_fill:
            from msid_tpu.ops.fill import detect_and_fill

            filled, alive = detect_and_fill(
                x, self.fill_gram, rms_thresh=self.fill_rms_thresh)
            cond = self.mask_cond(alive.reshape(b, self.in_channels))
            x = filled.astype(self.dtype)

        tokens = self.encoder(x, train=train, cond=cond)  # [B, N, D]
        grid = self.image_size // self.patch_size
        spatial = tokens.reshape(b, grid, grid, self.embed_dim)  # NHWC fold
        if self.decoder_arch == "unet_skip":
            skips = self.skip_stem(x.astype(self.dtype), train=train)
            out = self.decoder(spatial, skips, train=train)
        else:
            out = self.decoder(spatial, train=train)  # [B, H, W, out_ch]
        if self.residual_output:
            # With input_fill, x is already the filled tile — the residual
            # baseline is then the 46.4-dB linear_fill, not the raw noisy.
            out = out + x.astype(out.dtype)
        return out

    @classmethod
    def from_config(cls, config: dict, dtype: Dtype = jnp.float32,
                    axis_name: Optional[str] = None) -> "SatMAERestoration":
        """Build from the reference YAML schema (`model:` section)."""
        enc = config["model"]["encoder"]
        dec = config["model"]["decoder"]
        data = config.get("data", {})
        # preset from `name` (if known) gives the defaults; explicit
        # embed_dim/depth/num_heads keys still win
        preset = ENCODER_PRESETS.get(str(enc.get("name", "")), {})
        return cls(
            image_size=int(data.get("image_size", 192)),
            patch_size=int(enc.get("patch_size", 16)),
            in_channels=int(enc.get("input_channels", 13)),
            embed_dim=int(enc.get("embed_dim", preset.get("embed_dim", 768))),
            depth=int(enc.get("depth", preset.get("depth", 12))),
            num_heads=int(enc.get("num_heads", preset.get("num_heads", 12))),
            decoder_arch=str(dec.get("architecture", "unet_light")),
            decoder_channels=tuple(dec.get("channels", (384, 192, 96, 48))),
            out_channels=int(dec.get("output_channels", 13)),
            residual_output=bool(dec.get("residual", False)),
            input_fill=bool(
                config["model"].get("input_fill", {}).get("enabled", False)),
            fill_rms_thresh=float(
                config["model"].get("input_fill", {}).get("rms_thresh", 0.05)),
            norm=str(dec.get("norm", "batch")),
            gradient_checkpointing=bool(enc.get("gradient_checkpointing", True)),
            dtype=dtype,
            axis_name=axis_name,
        )


def count_parameters(params) -> dict:
    """Per-submodule parameter breakdown (ref satmae_restoration.py:137-165)."""
    def _count(tree) -> int:
        return sum(int(math.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))

    p = params.get("params", params)
    encoder = _count(p.get("encoder", {}))
    decoder = _count(p.get("decoder", {}))
    out = {
        "encoder": encoder,
        "decoder": decoder,
        "total": _count(p),  # includes extras like the unet_skip stem
    }
    extra = out["total"] - encoder - decoder
    if extra:
        out["other"] = extra
    return out


def init_model(
    model: nn.Module, key: jax.Array, batch_size: int = 1
) -> dict:
    """Initialize variables with a dummy batch; returns the full variables
    pytree ({'params', 'batch_stats'?}).

    Init runs on CPU and the result is transferred: initialization traces a
    full forward pass, and compiling that program on the accelerator is
    pure warm-up waste (measured 169 s on a tunneled v5e vs seconds on
    host) — the training/eval step compiles its own program anyway."""
    dummy = jnp.zeros(
        (batch_size, model.image_size, model.image_size, model.in_channels),
        jnp.float32,
    )
    cpu = jax.devices("cpu")[0] if jax.default_backend() != "cpu" else None
    if cpu is None:
        return model.init({"params": key}, dummy, train=False)
    with jax.default_device(cpu):
        variables = model.init({"params": key}, dummy, train=False)
    # explicit target: device_put without one is identity for arrays
    # already committed to the CPU
    return jax.device_put(variables, jax.devices()[0])
