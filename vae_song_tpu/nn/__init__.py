from vae_song_tpu.nn.initializers import (
    torch_linear_kernel_init,
    torch_bias_init,
    torch_positive_linear_init,
)
from vae_song_tpu.nn.blocks import (
    Dense,
    Conv,
    MLPBlock,
    ResidualMLPBlock,
    ResidualConvBlock,
    PlainConvolution,
    PositiveLinear,
    ICNN,
    LinearModuleEP,
)
from vae_song_tpu.nn.moe import MoEFFN

__all__ = [
    "MoEFFN",
    "torch_linear_kernel_init",
    "torch_bias_init",
    "torch_positive_linear_init",
    "Dense",
    "Conv",
    "MLPBlock",
    "ResidualMLPBlock",
    "ResidualConvBlock",
    "PlainConvolution",
    "PositiveLinear",
    "ICNN",
    "LinearModuleEP",
]
