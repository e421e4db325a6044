from .dispnet import (
    ConvLReLU,
    DeconvLReLU,
    DispnetContextEncoder,
    DispnetCostvolumeEncoder,
    DispnetDecoder,
    DispnetEncoder,
    IConvBlock,
    LearnedFusion,
    PredBlock,
    relu_and_sigmoid,
)

__all__ = [
    "ConvLReLU",
    "DeconvLReLU",
    "DispnetContextEncoder",
    "DispnetCostvolumeEncoder",
    "DispnetDecoder",
    "DispnetEncoder",
    "IConvBlock",
    "LearnedFusion",
    "PredBlock",
    "relu_and_sigmoid",
]
