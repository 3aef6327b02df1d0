"""Deconver models: blind-deconvolution mixing blocks in a U-Net.

TPU-native counterpart of the reference model family
(reference: factorizer/deconver.py).  Channels-last internals; Deconv options
are explicit fields threaded down, mirroring the Factorizer module design.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
from jax import Array

from ..factorization.deconv import Deconv
from ..layers.basic import (
    Conv,
    LayerNorm,
    Linear,
    MLP,
    maybe_fused_prenorm_mlp,
    resolve_activation,
)
from ..utils.helpers import partialize
from .unet import UNet, dtype_kwargs

__all__ = ["DeconvMixer", "DeconverBlock", "DeconverStage", "Stem", "Deconver"]


class DeconvMixer(nn.Module):
    """Blind-deconvolutional token mixing (reference: deconver.py:9-46)."""

    in_channels: int
    out_channels: int
    act: Any = "relu"
    dropout: float = 0.0
    kernel_size: Sequence[int] = (3, 3, 3)
    source_channels: Optional[int] = None
    ratio: float = 4
    groups: int = 8
    update_source: bool = True
    update_filter: bool = False
    eps: float = 1e-16
    num_iters: int = 2
    num_grad_iters: Optional[int] = None
    dtype: Any = None

    def setup(self) -> None:
        self.in_proj = Linear(self.in_channels, self.out_channels, bias=False, dtype=self.dtype)
        self.deconv = Deconv(
            self.out_channels,
            kernel_size=self.kernel_size,
            source_channels=self.source_channels,
            ratio=self.ratio,
            groups=self.groups,
            update_source=self.update_source,
            update_filter=self.update_filter,
            eps=self.eps,
            num_iters=self.num_iters,
            num_grad_iters=self.num_grad_iters,
            dtype=self.dtype,
        )
        self.act_fn = resolve_activation(self.act)
        groups = self.out_channels if self.groups == -1 else self.groups
        source_channels = round(
            self.out_channels * self.ratio / groups
            if self.source_channels is None
            else self.source_channels
        )
        deconv_out = groups * source_channels
        self.out_proj = Linear(deconv_out, self.out_channels, dtype=self.dtype)
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out = self.in_proj(x)
        out = self.act_fn(out)
        out = self.deconv(out)
        out = self.out_proj(out)
        out = self.drop(out, deterministic=deterministic)
        return out


class DeconverBlock(nn.Module):
    """Pre-norm residual block with deconvolution mixing (reference: deconver.py:49-65)."""

    channels: int
    norm: Any = LayerNorm
    dropout: float = 0.0
    mlp_ratio: float = 4
    act: Any = "relu"
    kernel_size: Sequence[int] = (3, 3, 3)
    source_channels: Optional[int] = None
    ratio: float = 4
    groups: int = 8
    update_source: bool = True
    update_filter: bool = False
    eps: float = 1e-16
    num_iters: int = 2
    num_grad_iters: Optional[int] = None
    dtype: Any = None

    def setup(self) -> None:
        norm = partialize(self.norm)
        norm_kwargs = dtype_kwargs(self.norm, self.dtype)
        self.norm1 = norm(self.channels, **norm_kwargs)
        self.dcm = DeconvMixer(
            self.channels,
            self.channels,
            act=self.act,
            dropout=self.dropout,
            kernel_size=self.kernel_size,
            source_channels=self.source_channels,
            ratio=self.ratio,
            groups=self.groups,
            update_source=self.update_source,
            update_filter=self.update_filter,
            eps=self.eps,
            num_iters=self.num_iters,
            num_grad_iters=self.num_grad_iters,
            dtype=self.dtype,
        )
        self.norm2 = norm(self.channels, **norm_kwargs)
        self.mlp = MLP(self.channels, ratio=self.mlp_ratio, dropout=self.dropout, dtype=self.dtype)

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = x + self.dcm(self.norm1(x), deterministic=deterministic)
        y = None
        if not self.is_initializing():
            y = maybe_fused_prenorm_mlp(self.norm2, self.mlp, x, deterministic)
        if y is None:
            y = x + self.mlp(self.norm2(x), deterministic=deterministic)
        return y


class DeconverStage(nn.Module):
    """One resolution stage of Deconver blocks (translation-invariant, no
    spatial_size needed; reference: deconver.py:91-122)."""

    in_channels: int
    out_channels: int
    spatial_size: Any = None  # accepted and ignored, for UNet interface parity
    depth: int = 1
    adapter: Any = (Linear, {"bias": False})
    norm: Any = LayerNorm
    dropout: float = 0.0
    mlp_ratio: float = 4
    act: Any = "relu"
    kernel_size: Sequence[int] = (3, 3, 3)
    source_channels: Optional[int] = None
    ratio: float = 4
    groups: int = 8
    update_source: bool = True
    update_filter: bool = False
    eps: float = 1e-16
    num_iters: int = 2
    num_grad_iters: Optional[int] = None
    dtype: Any = None

    def setup(self) -> None:
        if self.in_channels != self.out_channels:
            adapter_kwargs = dtype_kwargs(self.adapter, self.dtype)
            self.adapter_ = partialize(self.adapter)(
                self.in_channels, self.out_channels, **adapter_kwargs
            )
        else:
            self.adapter_ = None
        self.blocks = [
            DeconverBlock(
                self.out_channels,
                norm=self.norm,
                dropout=self.dropout,
                mlp_ratio=self.mlp_ratio,
                act=self.act,
                kernel_size=self.kernel_size,
                source_channels=self.source_channels,
                ratio=self.ratio,
                groups=self.groups,
                update_source=self.update_source,
                update_filter=self.update_filter,
                eps=self.eps,
                num_iters=self.num_iters,
                num_grad_iters=self.num_grad_iters,
                dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.depth)
        ]

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out = self.adapter_(x) if self.adapter_ is not None else x
        for blk in self.blocks:
            out = blk(out, deterministic=deterministic)
        return out


class Stem(nn.Module):
    """Patch-embedding stem: strided conv + norm (reference: deconver.py:125-133)."""

    in_channels: int
    out_channels: int
    patch_size: Sequence[int] = (4, 4)
    norm: Any = LayerNorm

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = len(self.patch_size)
        out = Conv(
            self.in_channels,
            self.out_channels,
            kernel_size=self.patch_size,
            stride=self.patch_size,
            name="conv",
        )(x)
        return partialize(self.norm)(self.out_channels, name="norm")(out)


class Deconver(nn.Module):
    """Deconver segmentation U-Net (reference: deconver.py:136-177)."""

    in_channels: int
    out_channels: int
    spatial_dims: int = 3
    encoder_depth: Sequence[int] = (1, 1, 1, 1, 1)
    encoder_width: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (1, 2, 2, 2, 2)
    decoder_depth: Sequence[int] = (1, 1, 1, 1)
    stem: Any = None
    downsample: Any = None
    upsample: Any = None
    head: Any = None
    num_deep_supr: Any = False
    data_format: str = "channels_first"
    # block-level options
    norm: Any = LayerNorm
    dropout: float = 0.0
    mlp_ratio: float = 4
    act: Any = "relu"
    kernel_size: Sequence[int] = (3, 3, 3)
    source_channels: Optional[int] = None
    ratio: float = 4
    groups: int = 8
    update_source: bool = True
    update_filter: bool = False
    eps: float = 1e-16
    num_iters: int = 2
    num_grad_iters: Optional[int] = None
    dtype: Any = None
    remat: bool = False

    def setup(self) -> None:
        stem = self.stem
        if stem is None:
            stem = (Conv, {"kernel_size": 3, "padding": 1, "bias": False})

        block_kwargs = dict(
            norm=self.norm,
            dropout=self.dropout,
            mlp_ratio=self.mlp_ratio,
            act=self.act,
            kernel_size=self.kernel_size,
            source_channels=self.source_channels,
            ratio=self.ratio,
            groups=self.groups,
            update_source=self.update_source,
            update_filter=self.update_filter,
            eps=self.eps,
            num_iters=self.num_iters,
            num_grad_iters=self.num_grad_iters,
            dtype=self.dtype,
        )
        n_stages = len(self.encoder_depth) + len(self.decoder_depth)
        block = n_stages * [(DeconverStage, block_kwargs)]

        self.unet = UNet(
            self.in_channels,
            self.out_channels,
            spatial_dims=self.spatial_dims,
            encoder_depth=self.encoder_depth,
            encoder_width=self.encoder_width,
            strides=self.strides,
            decoder_depth=self.decoder_depth,
            stem=stem,
            downsample=self.downsample,
            block=block,
            upsample=self.upsample,
            head=self.head,
            num_deep_supr=self.num_deep_supr,
            data_format=self.data_format,
            dtype=self.dtype,
            remat=self.remat,
        )

    def forward_features(self, x: Array, deterministic: bool = True) -> list[Array]:
        return self.unet.forward_features(x, deterministic=deterministic)

    def __call__(self, x: Array, train: bool = False):
        return self.unet(x, train=train)
