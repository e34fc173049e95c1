from vae_mdl_tpu.nn.blocks import (
    GLU,
    MLPBlock,
    ResidualBlock,
    EncoderBlock,
    StochasticEncoderBlock,
    DecoderBlock,
    StochasticDecoderBlock,
    merge_leading,
)
from vae_mdl_tpu.nn.encoders import ConvEncoder, ConvSpec, MLPEncoder
from vae_mdl_tpu.nn.decoders import ConvDecoder, MLPDecoder

__all__ = [
    "GLU",
    "MLPBlock",
    "ResidualBlock",
    "EncoderBlock",
    "StochasticEncoderBlock",
    "DecoderBlock",
    "StochasticDecoderBlock",
    "ConvEncoder",
    "ConvSpec",
    "ConvDecoder",
    "MLPEncoder",
    "MLPDecoder",
    "merge_leading",
]
