"""SegResNet: residual encoder-decoder segmentation CNN.

TPU-native reimplementation of the SegResNet baseline used by the reference's
model zoo bundles (reference: model_zoo/segresnet_*/configs/train.yaml
network_def; architecture after Myronenko 2018).  Channels-last; GroupNorm +
ReLU pre-activation residual blocks; strided-conv downsampling; decoder with
1x1 channel reduction + trilinear upsampling and additive skips.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..layers.basic import Conv, resolve_activation

__all__ = ["SegResNet", "SegResBlock"]


def _resize_linear(x: Array, factor: int) -> Array:
    """N-D linear upsampling by an integer factor (channels-last)."""
    spatial = x.shape[1:-1]
    new = tuple(s * factor for s in spatial)
    return jax.image.resize(x, (x.shape[0], *new, x.shape[-1]), method="linear")


class SegResBlock(nn.Module):
    """Pre-activation residual block: (GN -> ReLU -> Conv3) x 2 + skip."""

    channels: int
    norm_groups: int = 8
    act: Any = "relu"
    dtype: Any = None  # compute dtype (bfloat16 under amp); params stay float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = resolve_activation(self.act)
        out = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                           dtype=self.dtype, name="norm1")(x)
        out = act(out)
        out = Conv(self.channels, self.channels, kernel_size=3, padding=1,
                   dtype=self.dtype, name="conv1")(out)
        out = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                           dtype=self.dtype, name="norm2")(out)
        out = act(out)
        out = Conv(self.channels, self.channels, kernel_size=3, padding=1,
                   dtype=self.dtype, name="conv2")(out)
        return out + x


class SegResNet(nn.Module):
    """Residual encoder-decoder with additive-skip linear-upsample decoder.

    Attributes:
        init_filters: stem width (doubles per encoder level).
        blocks_down / blocks_up: residual blocks per level.
    """

    in_channels: int
    out_channels: int
    init_filters: int = 32
    blocks_down: Sequence[int] = (1, 2, 2, 4)
    blocks_up: Sequence[int] = (1, 1, 1)
    norm_groups: int = 8
    act: Any = "relu"
    dropout: float = 0.0
    upsample_mode: str = "deconv"  # "deconv" (reference profiler) | "linear"
    data_format: str = "channels_first"
    dtype: Any = None  # compute dtype (bfloat16 under amp); params stay float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.data_format == "channels_first":
            x = jnp.moveaxis(x, 1, -1)

        f = self.init_filters
        out = Conv(self.in_channels, f, kernel_size=3, padding=1, dtype=self.dtype,
                   name="stem")(x)
        if self.dropout:
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)

        skips = []
        for level, n_blocks in enumerate(self.blocks_down):
            width = f * (2**level)
            if level > 0:
                out = Conv(width // 2, width, kernel_size=3, stride=2, padding=1,
                           dtype=self.dtype, name=f"down{level}")(out)
            for j in range(n_blocks):
                out = SegResBlock(width, self.norm_groups, self.act, dtype=self.dtype,
                                  name=f"enc{level}_{j}")(out)
            skips.append(out)

        n_up = len(self.blocks_up)
        for i in range(n_up):
            level = len(self.blocks_down) - 1 - i
            width = f * (2 ** (level - 1))
            out = Conv(out.shape[-1], width, kernel_size=1, dtype=self.dtype,
                       name=f"reduce{i}")(out)
            if self.upsample_mode == "deconv":
                from ..layers.basic import ConvTranspose

                out = ConvTranspose(width, width, kernel_size=2, stride=2,
                                    dtype=self.dtype, name=f"up{i}")(out)
            else:
                out = _resize_linear(out, 2)
            out = out + skips[level - 1]
            for j in range(self.blocks_up[i]):
                out = SegResBlock(width, self.norm_groups, self.act, dtype=self.dtype,
                                  name=f"dec{i}_{j}")(out)

        out = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                           dtype=self.dtype, name="final_norm")(out)
        out = resolve_activation(self.act)(out)
        out = Conv(out.shape[-1], self.out_channels, kernel_size=1, dtype=self.dtype,
                   name="head")(out)

        if self.data_format == "channels_first":
            out = jnp.moveaxis(out, -1, 1)
        return out
