"""Generic CNN blocks for U-Nets (channels-last).

TPU-native counterparts of the reference conv blocks
(reference: factorizer/layers/conv.py:12-282).  Slots accept the
``partialize`` idiom: ``Class | (Class, args..., kwargs)``.
"""

from __future__ import annotations

from math import prod
from typing import Any, Optional

import flax.linen as nn
from jax import Array

from ..utils.helpers import as_tuple, partialize
from .basic import Conv, Dropout, GroupNorm, Linear, resolve_activation

__all__ = ["DoubleConv", "BasicBlock", "PreActivationBlock", "SepConv"]

_DEFAULT_CONV = (Conv, {"kernel_size": 3, "padding": 1})
_DEFAULT_NORM = (GroupNorm, (8,))
_DEFAULT_DROP = (Dropout, {"p": 0.0})


def _spec_class(spec: Any):
    """The underlying class of a partializable spec."""
    fn = partialize(spec)
    return getattr(fn, "func", fn)


class DoubleConv(nn.Module):
    """(Conv -> Drop -> Norm -> Act) x 2 (reference: conv.py:12-55)."""

    in_channels: int
    out_channels: int
    mid_channels: Optional[int] = None
    conv: Any = _DEFAULT_CONV
    norm: Any = _DEFAULT_NORM
    act: Any = "leaky_relu"
    drop: Any = _DEFAULT_DROP
    stride: Any = 1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        mid = self.out_channels if self.mid_channels is None else self.mid_channels
        conv = partialize(self.conv)
        norm = partialize(self.norm)
        drop = partialize(self.drop)
        act = resolve_activation(self.act)

        out = conv(self.in_channels, mid, stride=self.stride, name="conv1")(x)
        out = drop(name="drop1")(out, deterministic=deterministic)
        out = norm(mid, name="norm1")(out)
        out = act(out)

        out = conv(mid, self.out_channels, stride=1, name="conv2")(out)
        out = drop(name="drop2")(out, deterministic=deterministic)
        out = norm(self.out_channels, name="norm2")(out)
        out = act(out)
        return out


class BasicBlock(nn.Module):
    """Basic ResNet block (reference: conv.py:55-118)."""

    in_channels: int
    out_channels: int
    mid_channels: Optional[int] = None
    conv: Any = _DEFAULT_CONV
    norm: Any = _DEFAULT_NORM
    act: Any = "leaky_relu"
    drop: Any = _DEFAULT_DROP
    stride: Any = 1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        mid = self.out_channels if self.mid_channels is None else self.mid_channels
        conv = partialize(self.conv)
        norm = partialize(self.norm)
        drop = partialize(self.drop)
        act = resolve_activation(self.act)

        needs_projection = prod(as_tuple(self.stride)) != 1 or self.in_channels != self.out_channels
        if needs_projection:
            shortcut = _spec_class(self.conv)(
                self.in_channels,
                self.out_channels,
                kernel_size=1,
                padding=0,
                stride=self.stride,
                bias=False,
                name="shortcut",
            )(x)
        else:
            shortcut = x

        out = conv(self.in_channels, mid, stride=self.stride, name="conv1")(x)
        out = drop(name="drop1")(out, deterministic=deterministic)
        out = norm(mid, name="norm1")(out)
        out = act(out)

        out = conv(mid, self.out_channels, stride=1, name="conv2")(out)
        out = drop(name="drop2")(out, deterministic=deterministic)
        out = norm(self.out_channels, name="norm2")(out)

        out = out + shortcut
        return act(out)


class PreActivationBlock(nn.Module):
    """Pre-activation ResNet block (reference: conv.py:118-176)."""

    in_channels: int
    out_channels: int
    mid_channels: Optional[int] = None
    conv: Any = _DEFAULT_CONV
    norm: Any = _DEFAULT_NORM
    act: Any = "leaky_relu"
    drop: Any = _DEFAULT_DROP
    stride: Any = 1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        mid = self.out_channels if self.mid_channels is None else self.mid_channels
        conv = partialize(self.conv)
        norm = partialize(self.norm)
        drop = partialize(self.drop)
        act = resolve_activation(self.act)

        out = norm(self.in_channels, name="norm1")(x)
        out = act(out)

        needs_projection = prod(as_tuple(self.stride)) != 1 or self.in_channels != self.out_channels
        if needs_projection:
            shortcut = _spec_class(self.conv)(
                self.in_channels,
                self.out_channels,
                kernel_size=1,
                padding=0,
                stride=self.stride,
                bias=False,
                name="shortcut",
            )(out)
        else:
            shortcut = x

        out = conv(self.in_channels, mid, stride=self.stride, name="conv1")(out)
        out = drop(name="drop1")(out, deterministic=deterministic)

        out = norm(mid, name="norm2")(out)
        out = act(out)
        out = conv(mid, self.out_channels, stride=1, name="conv2")(out)
        out = drop(name="drop2")(out, deterministic=deterministic)

        return out + shortcut


class SepConv(nn.Module):
    """Inverted separable convolution (MobileNetV2-style; reference: conv.py:229-282)."""

    in_channels: int
    out_channels: Optional[int] = None
    hidden_channels: Optional[int] = None
    ratio: float = 2
    act: Any = "gelu"
    kernel_size: int = 5
    stride: Any = 1
    padding: int = 2
    dilation: int = 1
    bias: Any = True

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out_ch = self.in_channels if self.out_channels is None else self.out_channels
        hidden = (
            int(self.ratio * self.in_channels)
            if self.hidden_channels is None
            else self.hidden_channels
        )
        act = resolve_activation(self.act)

        out = Linear(self.in_channels, hidden, bias=False, name="pwconv1")(x)
        out = act(out)
        out = Conv(
            hidden,
            hidden,
            kernel_size=self.kernel_size,
            groups=hidden,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            bias=self.bias,
            name="dwconv",
        )(out)
        out = Linear(hidden, out_ch, name="pwconv2")(out)
        return out
