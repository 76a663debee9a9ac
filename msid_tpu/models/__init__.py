"""Model layer: encoder, decoders, composite restoration model, converters."""

from msid_tpu.models.blocks import (
    ConvBlock,
    DepthwiseSeparableConv,
    Norm,
    ResidualBlock,
    SpatialAttention,
    SqueezeExcitation,
    UpsampleBlock,
)
from msid_tpu.models.decoder import (
    DECODER_REGISTRY,
    AttentionDecoder,
    LightweightDecoder,
    UNetDecoder,
)
from msid_tpu.models.encoder import PatchEmbed, SatMAEEncoder, ViTBlock
from msid_tpu.models.restoration import SatMAERestoration, count_parameters, init_model

__all__ = [
    "AttentionDecoder",
    "ConvBlock",
    "DECODER_REGISTRY",
    "DepthwiseSeparableConv",
    "LightweightDecoder",
    "Norm",
    "PatchEmbed",
    "ResidualBlock",
    "SatMAEEncoder",
    "SatMAERestoration",
    "SpatialAttention",
    "SqueezeExcitation",
    "UNetDecoder",
    "UpsampleBlock",
    "ViTBlock",
    "count_parameters",
    "init_model",
]
