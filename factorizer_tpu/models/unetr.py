"""UNETR: ViT encoder + convolutional decoder for volumetric segmentation.

TPU-native reimplementation of the UNETR baseline the reference profiles
(reference: tests/profiler.py:116-129, MONAI UNETR after Hatamizadeh et al.
2021).  Channels-last; the ViT runs as plain batched matmuls over the patch
sequence (MXU-friendly: seq 512 x hidden 768 at 128^3/patch 16), and hidden
states after transformer layers 3/6/9/12 feed progressive-upsampling conv
branches exactly like the torch architecture.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..layers.basic import Conv, ConvTranspose, InstanceNorm, resolve_activation

__all__ = ["UNETR"]


class _ViTBlock(nn.Module):
    """Pre-norm transformer block: MHA + GELU MLP."""

    hidden: int
    mlp_dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.hidden,
            dtype=self.dtype, name="attn",
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class _ResBlock(nn.Module):
    """UnetResBlock: (conv3-IN-lrelu) x2 + projected skip."""

    in_channels: int
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = resolve_activation("leaky_relu")
        h = Conv(self.in_channels, self.out_channels, 3, padding=1,
                 dtype=self.dtype, name="conv1")(x)
        h = InstanceNorm(self.out_channels, affine=True, name="norm1")(h)
        h = act(h)
        h = Conv(self.out_channels, self.out_channels, 3, padding=1,
                 dtype=self.dtype, name="conv2")(h)
        h = InstanceNorm(self.out_channels, affine=True, name="norm2")(h)
        if self.in_channels != self.out_channels:
            x = Conv(self.in_channels, self.out_channels, 1, dtype=self.dtype,
                     name="skip")(x)
        return act(h + x)


class _PrUpBlock(nn.Module):
    """Progressive upsampling branch: deconv, then num_layer x (deconv + res).

    (monai UnetrPrUpBlock with conv_block=True, res_block=True)
    """

    in_channels: int
    out_channels: int
    num_layer: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = ConvTranspose(self.in_channels, self.out_channels, kernel_size=2,
                          stride=2, dtype=self.dtype, name="up0")(x)
        for i in range(self.num_layer):
            x = ConvTranspose(self.out_channels, self.out_channels, kernel_size=2,
                              stride=2, dtype=self.dtype, name=f"up{i + 1}")(x)
            x = _ResBlock(self.out_channels, self.out_channels, dtype=self.dtype,
                          name=f"res{i}")(x)
        return x


class UNETR(nn.Module):
    """UNETR for volumetric segmentation (reference profiler config:
    feature_size 16, hidden 768, mlp 3072, 12 heads, 124.5M params).

    Attributes:
        img_size: input spatial size (must be divisible by 16).
        feature_size: decoder base width.
        hidden_size/mlp_dim/num_heads/num_layers: ViT config.
    """

    in_channels: int
    out_channels: int
    img_size: Sequence[int] = (128, 128, 128)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch_size: int = 16
    data_format: str = "channels_first"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.data_format == "channels_first":
            x = jnp.moveaxis(x, 1, -1)
        B = x.shape[0]
        ps = self.patch_size
        feat = tuple(s // ps for s in self.img_size)
        n_patches = feat[0] * feat[1] * feat[2]
        fs, hid = self.feature_size, self.hidden_size

        # patch embedding (conv proj, like monai proj_type="conv") + pos embed
        z = Conv(self.in_channels, hid, kernel_size=ps, stride=ps,
                 dtype=self.dtype, name="patch_embed")(x)
        z = z.reshape(B, n_patches, hid)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, n_patches, hid))
        z = z + pos.astype(z.dtype)

        # ViT trunk; keep hidden states at the quarter points (layers
        # 3/6/9/12 for the canonical 12-layer config).
        taps = [max(1, round(self.num_layers * k / 4)) for k in (1, 2, 3, 4)]
        hidden_states = {}
        for i in range(self.num_layers):
            z = _ViTBlock(hid, self.mlp_dim, self.num_heads, dtype=self.dtype,
                          name=f"vit{i}")(z)
            if (i + 1) in taps:
                hidden_states[i + 1] = z
        z12 = nn.LayerNorm(dtype=self.dtype, name="vit_norm")(hidden_states[taps[3]])

        def to_volume(t: Array) -> Array:
            return t.reshape(B, *feat, hid)

        enc1 = _ResBlock(self.in_channels, fs, dtype=self.dtype, name="encoder1")(x)
        enc2 = _PrUpBlock(hid, 2 * fs, num_layer=2, dtype=self.dtype,
                          name="encoder2")(to_volume(hidden_states[taps[0]]))
        enc3 = _PrUpBlock(hid, 4 * fs, num_layer=1, dtype=self.dtype,
                          name="encoder3")(to_volume(hidden_states[taps[1]]))
        enc4 = _PrUpBlock(hid, 8 * fs, num_layer=0, dtype=self.dtype,
                          name="encoder4")(to_volume(hidden_states[taps[2]]))

        def up(h: Array, skip: Array, cin: int, cout: int, name: str) -> Array:
            h = ConvTranspose(cin, cout, kernel_size=2, stride=2,
                              dtype=self.dtype, name=f"{name}_up")(h)
            h = jnp.concatenate([h, skip], axis=-1)
            return _ResBlock(2 * cout, cout, dtype=self.dtype,
                             name=f"{name}_block")(h)

        d4 = up(to_volume(z12), enc4, hid, 8 * fs, "decoder4")
        d3 = up(d4, enc3, 8 * fs, 4 * fs, "decoder3")
        d2 = up(d3, enc2, 4 * fs, 2 * fs, "decoder2")
        d1 = up(d2, enc1, 2 * fs, fs, "decoder1")

        out = Conv(fs, self.out_channels, kernel_size=1, name="head")(d1)
        if self.data_format == "channels_first":
            out = jnp.moveaxis(out, -1, 1)
        return out
