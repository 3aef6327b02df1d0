"""Positional embeddings for channels-last volumes.

TPU-native counterparts of the reference embeddings
(reference: factorizer/layers/pos_embed.py:9-130), with the channel axis
moved last.  Fixed tables are computed once at trace time and become XLA
constants; learnable tables are ordinary params.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = [
    "SinusoidalPositionalEmbedding",
    "RotaryPositionalEmbedding",
    "PositionalEmbedding",
    "PosEmbed",
    "AxialPositionalEmbedding",
]


def _angle_table(channels: int, spatial_size: Sequence[int]) -> np.ndarray:
    """theta[s1..sp, c/2] = sum_axis position * freq_c (reference: pos_embed.py:20-28)."""
    p = len(spatial_size)
    freqs = np.exp(np.arange(0, channels, 2) * (-math.log(10000.0) / channels))
    theta = np.zeros((*spatial_size, len(freqs)), dtype=np.float32)
    for axis, size in enumerate(spatial_size):
        pos = np.arange(size, dtype=np.float32).reshape(
            *[size if j == axis else 1 for j in range(p)], 1
        )
        theta = theta + pos * freqs.reshape(*([1] * p), -1)
    return theta


class SinusoidalPositionalEmbedding(nn.Module):
    """Additive fixed sinusoidal embedding; ``x + pe`` with ``pe: (1, *S, C)``."""

    channels: int
    spatial_size: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        theta = _angle_table(self.channels, tuple(self.spatial_size))
        pe = np.concatenate([np.cos(theta), np.sin(theta)], axis=-1)[None]
        return x + jnp.asarray(pe, dtype=x.dtype)


class RotaryPositionalEmbedding(nn.Module):
    """Rotary embedding applied over the channel halves (reference: pos_embed.py:41-70)."""

    channels: int
    spatial_size: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        theta = _angle_table(self.channels, tuple(self.spatial_size))
        theta = np.concatenate([theta, theta], axis=-1)[None]
        cos = jnp.asarray(np.cos(theta), dtype=x.dtype)
        sin = jnp.asarray(np.sin(theta), dtype=x.dtype)
        d = x.shape[-1]
        x1, x2 = x[..., : d // 2], x[..., d // 2 :]
        x_half = jnp.concatenate([-x2, x1], axis=-1)
        return cos * x + sin * x_half


class PositionalEmbedding(nn.Module):
    """Learnable additive embedding of shape ``(1, *S, C)`` ~ N(0, 1)."""

    channels: int
    spatial_size: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pos = self.param(
            "pos",
            lambda key, shape: jax.random.normal(key, shape, jnp.float32),
            (1, *self.spatial_size, self.channels),
        )
        return x + pos.astype(x.dtype)


PosEmbed = PositionalEmbedding  # alias, as in the reference (pos_embed.py:93)


class AxialPositionalEmbedding(nn.Module):
    """Learnable per-axis additive embeddings (reference: pos_embed.py:96-130)."""

    channels: int
    spatial_size: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = len(self.spatial_size)
        out = x
        for axis, size in enumerate(self.spatial_size):
            shape = (1, *[size if j == axis else 1 for j in range(p)], self.channels)
            pe = self.param(
                f"pe{axis}",
                lambda key, shape: jax.random.normal(key, shape, jnp.float32),
                shape,
            )
            out = out + pe.astype(x.dtype)
        return out
