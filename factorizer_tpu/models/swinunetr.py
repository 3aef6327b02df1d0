"""SwinUNETR: 3-D Swin-transformer encoder + convolutional UNETR decoder.

TPU-native reimplementation of the SwinUNETR baseline used by the
reference's model zoo (reference: model_zoo/swinunetr_isles22/configs/
train.yaml network_def; architecture after Hatamizadeh et al. 2022).
Channels-last; window attention folds to ``(B*windows, window_voxels, C)``
batches of matmuls (MXU-friendly), shifted windows use ``jnp.roll`` with a
device-computed attention mask, and patch merging is a pure
reshape + Dense.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..layers.basic import Conv, ConvTranspose, InstanceNorm, resolve_activation
from ..utils.helpers import to_ntuple

__all__ = ["SwinUNETR", "WindowAttention", "SwinBlock"]


def _window_partition(x: Array, window: Sequence[int]) -> Array:
    """(B, D, H, W, C) -> (B*nW, prod(window), C)."""
    B, D, H, W, C = x.shape
    wd, wh, ww = window
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(-1, wd * wh * ww, C)


def _window_reverse(x: Array, window: Sequence[int], dims: Sequence[int]) -> Array:
    """Inverse of :func:`_window_partition`."""
    D, H, W = dims
    wd, wh, ww = window
    C = x.shape[-1]
    B = x.shape[0] // ((D // wd) * (H // wh) * (W // ww))
    x = x.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, C)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(B, D, H, W, C)


def _relative_position_index(window: Sequence[int]) -> np.ndarray:
    """Pairwise relative-position bucket index within a window (static)."""
    coords = np.stack(
        np.meshgrid(*[np.arange(w) for w in window], indexing="ij")
    ).reshape(len(window), -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    for i, w in enumerate(window):
        rel[:, :, i] += w - 1
    strides = [1]
    for w in reversed([2 * w - 1 for w in window[1:]]):
        strides.insert(0, strides[0] * w)
    # index = sum_i rel_i * prod_{j>i}(2*w_j - 1)
    mult = np.ones(len(window), np.int64)
    for i in range(len(window) - 2, -1, -1):
        mult[i] = mult[i + 1] * (2 * window[i + 1] - 1)
    return (rel * mult).sum(-1)


def _shift_attention_mask(dims: Sequence[int], window: Sequence[int], shift: Sequence[int]) -> Array:
    """Swin SW-MSA mask: blocks attention across rolled-in boundaries.

    Computed as a device-side jnp expression (NOT a numpy constant: at
    128^3 the (nW, N, N) mask is hundreds of MB, which would be baked into
    the HLO as a literal and blow up program size/compile transport).
    """

    def region(d: int, w: int, s: int) -> Array:
        x = jnp.arange(d)
        return (x >= (d - w)).astype(jnp.int32) + (x >= (d - s)).astype(jnp.int32)

    r = [region(d, w, s) for d, w, s in zip(dims, window, shift)]
    img = r[0][:, None, None] * 9 + r[1][None, :, None] * 3 + r[2][None, None, :]
    wins = img.reshape(
        dims[0] // window[0], window[0], dims[1] // window[1], window[1],
        dims[2] // window[2], window[2],
    )
    wins = jnp.transpose(wins, (0, 2, 4, 1, 3, 5)).reshape(-1, int(np.prod(window)))
    mask = wins[:, None, :] != wins[:, :, None]
    return jnp.where(mask, -1e9, 0.0).astype(jnp.float32)  # (nW, N, N)


class WindowAttention(nn.Module):
    """Multi-head self-attention within local windows + relative position bias."""

    dim: int
    num_heads: int
    window: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        # x: (B*nW, N, C)
        Bn, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (Bn, N, H, hd)
        q = jnp.swapaxes(q, 1, 2) * (head_dim**-0.5)  # (Bn, H, N, hd)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)

        n_bias = int(np.prod([2 * w - 1 for w in self.window]))
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            (n_bias, self.num_heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window))
        bias = table[idx].transpose(2, 0, 1)  # (H, N, N)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, self.num_heads, N, N)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bn, self.num_heads, N, N)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """Swin transformer block: (S)W-MSA + MLP with pre-norm residuals."""

    dim: int
    num_heads: int
    window: Sequence[int]
    shift: Sequence[int]
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # x: (B, D, H, W, C).  Dims that are not multiples of the window are
        # zero-padded for the attention and cropped after (MONAI behavior:
        # swin_unetr.py pads in forward_part1 without masking the pad).
        dims = x.shape[1:4]
        window = tuple(min(w, d) for w, d in zip(self.window, dims))
        shift = tuple(0 if w >= d else s for w, s, d in zip(self.window, self.shift, dims))

        shortcut = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        pdims = tuple(-(-d // w) * w for d, w in zip(dims, window))
        pads = [(0, 0)] + [(0, pd - d) for pd, d in zip(pdims, dims)] + [(0, 0)]
        if pdims != dims:
            h = jnp.pad(h, pads)
        if any(shift):
            h = jnp.roll(h, [-s for s in shift], axis=(1, 2, 3))
            mask = _shift_attention_mask(pdims, window, shift)
        else:
            mask = None
        wins = _window_partition(h, window)
        wins = WindowAttention(self.dim, self.num_heads, window, dtype=self.dtype, name="attn")(
            wins, mask
        )
        h = _window_reverse(wins, window, pdims)
        if any(shift):
            h = jnp.roll(h, shift, axis=(1, 2, 3))
        if pdims != dims:
            h = h[:, : dims[0], : dims[1], : dims[2]]
        x = shortcut + h

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    """2x downsample: concat 2^3 neighbors -> LN -> Dense(2C)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, D, H, W, C = x.shape
        x = x.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
            B, D // 2, H // 2, W // 2, 8 * C
        )
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, dtype=self.dtype, name="reduction")(x)


class _ConvBlock(nn.Module):
    """UNETR residual conv block: (conv3-IN-lrelu) x2 + projected skip."""

    in_channels: int
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = resolve_activation("leaky_relu")
        h = Conv(self.in_channels, self.out_channels, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        h = InstanceNorm(self.out_channels, affine=True, name="norm1")(h)
        h = act(h)
        h = Conv(self.out_channels, self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2")(h)
        h = InstanceNorm(self.out_channels, affine=True, name="norm2")(h)
        if self.in_channels != self.out_channels:
            x = Conv(self.in_channels, self.out_channels, 1, dtype=self.dtype, name="skip")(x)
        return act(h + x)


class SwinUNETR(nn.Module):
    """Swin-UNETR for volumetric segmentation.

    Attributes:
        feature_size: embed dim of the first Swin stage (48 in the bundles).
        depths/num_heads: per-stage Swin config.
        window_size: attention window (7 in the reference bundles; must
            divide the stage resolution or it is clamped per-stage).
    """

    in_channels: int
    out_channels: int
    img_size: Sequence[int] = (64, 64, 64)
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    use_v2: bool = False
    data_format: str = "channels_first"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.data_format == "channels_first":
            x = jnp.moveaxis(x, 1, -1)

        window = to_ntuple(self.window_size, 3)
        shift = tuple(w // 2 for w in window)
        fs = self.feature_size

        # patch embedding (2x downsample)
        h = Conv(self.in_channels, fs, kernel_size=2, stride=2, dtype=self.dtype, name="patch_embed")(x)

        # Swin stages.  Matching MONAI's SwinTransformer: EVERY stage ends
        # with a PatchMerging (4 merges total, bottleneck width 16*fs), and
        # the hidden states kept as skips are [x0 (pre-stage), x1..x4
        # (post-merge)] (monai swin_unetr.py layers1..layers4).
        skips = [h]
        dim = fs
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            if self.use_v2:
                # SwinUNETR V2: a residual conv block enters each Swin stage
                # (reference: tests/profiler.py:142-153 `use_v2=True`; MONAI
                # SwinTransformer layers1c..layers4c at dims fs*2^s).
                h = _ConvBlock(dim, dim, dtype=self.dtype, name=f"stage{s}_conv")(h)
            for b in range(depth):
                blk_shift = (0, 0, 0) if b % 2 == 0 else shift
                h = SwinBlock(
                    dim, heads, window, blk_shift, self.mlp_ratio, dtype=self.dtype,
                    name=f"stage{s}_block{b}",
                )(h, deterministic=not train)
            h = PatchMerging(dim, dtype=self.dtype, name=f"merge{s}")(h)
            dim *= 2
            skips.append(h)

        # UNETR-style decoder (monai SwinUNETR encoder1..encoder10 +
        # decoder5..decoder1: note x3 feeds decoder5 RAW, without a conv
        # block of its own).
        x0, x1, x2, x3, x4 = skips
        enc1 = _ConvBlock(self.in_channels, fs, dtype=self.dtype, name="encoder1")(x)
        enc2 = _ConvBlock(fs, fs, dtype=self.dtype, name="encoder2")(x0)
        enc3 = _ConvBlock(2 * fs, 2 * fs, dtype=self.dtype, name="encoder3")(x1)
        enc4 = _ConvBlock(4 * fs, 4 * fs, dtype=self.dtype, name="encoder4")(x2)
        enc10 = _ConvBlock(16 * fs, 16 * fs, dtype=self.dtype, name="encoder10")(x4)

        def up(x, skip, cin, cout, name):
            x = ConvTranspose(cin, cout, kernel_size=2, stride=2, dtype=self.dtype, name=f"{name}_up")(x)
            x = jnp.concatenate([x, skip], axis=-1)
            return _ConvBlock(2 * cout, cout, dtype=self.dtype, name=f"{name}_block")(x)

        d5 = up(enc10, x3, 16 * fs, 8 * fs, "decoder5")
        d4 = up(d5, enc4, 8 * fs, 4 * fs, "decoder4")
        d3 = up(d4, enc3, 4 * fs, 2 * fs, "decoder3")
        d2 = up(d3, enc2, 2 * fs, fs, "decoder2")
        d1 = up(d2, enc1, fs, fs, "decoder1")

        out = Conv(fs, self.out_channels, kernel_size=1, name="head")(d1)
        if self.data_format == "channels_first":
            out = jnp.moveaxis(out, -1, 1)
        return out
