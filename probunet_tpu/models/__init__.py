from probunet_tpu.models.layers import (
    EDMConv,
    EDMLinear,
    EDMGroupNorm,
    PositionalEmbedding,
    FourierEmbedding,
    UNetBlock,
)
from probunet_tpu.models.unet import UNet, PostUNetWithSkips, PostUNetWithoutSkips, UNetAll
from probunet_tpu.models.gaussian import AxisAlignedConvGaussian
from probunet_tpu.models.fcomb import Fcomb
from probunet_tpu.models.prob_unet import ProbabilisticUNet
from probunet_tpu.models.edm import EDMPrecond
from probunet_tpu.models.baselines import LinearCNN, bcsd

__all__ = [
    "EDMConv",
    "EDMLinear",
    "EDMGroupNorm",
    "PositionalEmbedding",
    "FourierEmbedding",
    "UNetBlock",
    "UNet",
    "PostUNetWithSkips",
    "PostUNetWithoutSkips",
    "UNetAll",
    "AxisAlignedConvGaussian",
    "Fcomb",
    "ProbabilisticUNet",
    "EDMPrecond",
    "LinearCNN",
    "bcsd",
]
