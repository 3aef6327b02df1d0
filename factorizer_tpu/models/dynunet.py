"""DynUNet: an nnU-Net-style dynamic U-Net.

TPU-native reimplementation of the DynUNet baseline used by the reference's
model zoo bundles (reference: model_zoo/nnunet_*/configs/train.yaml
network_def; nnU-Net architecture: Isensee et al.).  Channels-last;
(Conv -> InstanceNorm -> LeakyReLU) x 2 blocks, strided-conv downsampling,
transposed-conv upsampling with concatenated skips, optional deep
supervision heads on the decoder pyramid.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..layers.basic import Conv, ConvTranspose, InstanceNorm, resolve_activation
from ..utils.helpers import to_ntuple

__all__ = ["DynUNet", "DynUNetBlock"]


class DynUNetBlock(nn.Module):
    """(Conv -> InstanceNorm -> LeakyReLU) x 2, first conv may stride."""

    in_channels: int
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    act: Any = "leaky_relu"
    dtype: Any = None  # compute dtype (bfloat16 under amp); params stay float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = resolve_activation(self.act)
        p = x.ndim - 2
        ks = to_ntuple(self.kernel_size, p)
        pad = tuple(k // 2 for k in ks)
        out = Conv(self.in_channels, self.out_channels, kernel_size=ks,
                   stride=self.stride, padding=pad, dtype=self.dtype, name="conv1")(x)
        out = InstanceNorm(self.out_channels, affine=True, dtype=self.dtype, name="norm1")(out)
        out = act(out)
        out = Conv(self.out_channels, self.out_channels, kernel_size=ks,
                   stride=1, padding=pad, dtype=self.dtype, name="conv2")(out)
        out = InstanceNorm(self.out_channels, affine=True, dtype=self.dtype, name="norm2")(out)
        return act(out)


class DynUNet(nn.Module):
    """nnU-Net-style U-Net with per-stage kernels/strides and deep supervision.

    Attributes:
        kernel_size / strides: one entry per encoder stage (stride of stage 0
            applies to the stem block).
        filters: per-stage widths; default doubles from 32, capped at 320.
        deep_supervision: emit ``deep_supr_num`` extra heads on coarser
            decoder outputs (training-time auxiliary losses).
    """

    in_channels: int
    out_channels: int
    spatial_dims: int = 3
    kernel_size: Sequence[Any] = (3, 3, 3, 3, 3)
    strides: Sequence[Any] = (1, 2, 2, 2, 2)
    filters: Optional[Sequence[int]] = None
    deep_supervision: bool = False
    deep_supr_num: int = 1
    act: Any = "leaky_relu"
    data_format: str = "channels_first"
    dtype: Any = None  # compute dtype (bfloat16 under amp); params stay float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        if self.data_format == "channels_first":
            x = jnp.moveaxis(x, 1, -1)

        n = len(self.strides)
        filters = (
            list(self.filters)
            if self.filters is not None
            else [min(32 * (2**i), 320) for i in range(n)]
        )

        # encoder
        skips = []
        out = x
        widths_in = [self.in_channels] + filters[:-1]
        for i in range(n):
            out = DynUNetBlock(
                widths_in[i], filters[i], self.kernel_size[i], self.strides[i],
                act=self.act, dtype=self.dtype, name=f"enc{i}",
            )(out)
            skips.append(out)

        # decoder (deepest-first)
        ys = []
        for i in range(n - 1, 0, -1):
            up = ConvTranspose(
                out.shape[-1], filters[i - 1], kernel_size=self.strides[i],
                stride=self.strides[i], dtype=self.dtype, name=f"up{i}",
            )(out)
            cat = jnp.concatenate([skips[i - 1], up], axis=-1)
            out = DynUNetBlock(
                cat.shape[-1], filters[i - 1], self.kernel_size[i - 1], 1,
                act=self.act, dtype=self.dtype, name=f"dec{i}",
            )(cat)
            ys.append(out)

        head = Conv(out.shape[-1], self.out_channels, kernel_size=1, dtype=self.dtype,
                    name="head")(out)
        if self.data_format == "channels_first":
            head = jnp.moveaxis(head, -1, 1)

        if self.deep_supervision and train:
            outs = [head]
            # coarser decoder outputs, finest-first after the main head
            for j in range(self.deep_supr_num):
                y = ys[-2 - j]
                h = Conv(y.shape[-1], self.out_channels, kernel_size=1, dtype=self.dtype,
                         name=f"supr{j}")(y)
                if self.data_format == "channels_first":
                    h = jnp.moveaxis(h, -1, 1)
                outs.append(h)
            return outs
        return head
