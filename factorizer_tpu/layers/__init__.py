from .basic import (
    Identity,
    Linear,
    LayerNorm,
    MLP,
    Conv,
    ConvTranspose,
    Dropout,
    GroupNorm,
    InstanceNorm,
    resolve_activation,
    ACTIVATIONS,
)
from .conv_blocks import DoubleConv, BasicBlock, PreActivationBlock, SepConv
from .pos_embed import (
    SinusoidalPositionalEmbedding,
    RotaryPositionalEmbedding,
    PositionalEmbedding,
    PosEmbed,
    AxialPositionalEmbedding,
)
