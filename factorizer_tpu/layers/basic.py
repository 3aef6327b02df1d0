"""Basic layers: Linear, LayerNorm, MLP, Conv/ConvTranspose/Dropout wrappers.

TPU-native counterparts of the reference primitives
(reference: factorizer/layers/{linear,norm,mlp}.py).  All layers here are
**channels-last** native (``(B, *spatial, C)``): on TPU this removes the
reference's Conv1d-flatten contortion (linear.py:43-58) and the einsum
transposes around LayerNorm (norm.py:31-33) — a Dense / LayerNorm over the
trailing axis is already the optimal layout for the MXU/VPU.

Default initializers match torch's (kaiming-uniform with a=sqrt(5) for
kernels, fan-in uniform for biases) so training dynamics track the reference.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..utils.helpers import to_ntuple

__all__ = [
    "Identity",
    "Linear",
    "LayerNorm",
    "MLP",
    "Conv",
    "ConvTranspose",
    "Dropout",
    "GroupNorm",
    "torch_kernel_init",
    "torch_bias_init",
    "resolve_activation",
    "ACTIVATIONS",
]

# torch's nn.Linear/nn.ConvNd default: kaiming_uniform(a=sqrt(5)) == uniform with
# variance 1/(3*fan_in).
torch_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _gelu_exact(x: Array) -> Array:
    # torch nn.GELU default is the exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": _gelu_exact,
    "leaky_relu": jax.nn.leaky_relu,  # default negative_slope 0.01, same as torch
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def resolve_activation(spec: Any):
    """Resolve an activation spec: a name, an elementwise fn, or a factory.

    Accepts ``"relu"``, ``jax.nn.relu``, or a zero-arg factory returning an
    elementwise fn (the reference passes classes like ``nn.ReLU``).
    """
    if spec is None:
        return ACTIVATIONS["identity"]
    if isinstance(spec, str):
        return ACTIVATIONS[spec]
    try:
        probe = spec(jnp.zeros(()))
        if isinstance(probe, jnp.ndarray):
            return spec
    except TypeError:
        pass
    return spec()


class Identity(nn.Module):
    """No-op module (accepts and ignores extra constructor-free call args)."""

    @nn.compact
    def __call__(self, x: Array, *args: Any, **kwargs: Any) -> Array:
        return x


class Linear(nn.Module):
    """Pointwise linear over the channel (trailing) axis.

    Equivalent to the reference's channels-first 1x1-conv Linear
    (layers/linear.py:7-58) but a plain Dense in channels-last layout.

    Shape: ``(B, *spatial, C_in) -> (B, *spatial, C_out)``.
    """

    in_channels: int
    out_channels: int
    bias: Any = True  # truthiness, matching the reference quirk (factorizer.py:31)
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(
            self.out_channels,
            use_bias=bool(self.bias),
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.in_channels),
            name="linear",
        )(x)


class LayerNorm(nn.Module):
    """Layer normalization over the channel (trailing) axis.

    Matches the reference semantics (normalize over C only,
    layers/norm.py:5-34) without its transpose round trip.
    """

    dim: int
    eps: float = 1e-5  # torch default
    dtype: Any = None  # output/compute dtype; statistics always in float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)


class Dropout(nn.Module):
    """Dropout with torch-like ``p`` argument; inert when ``deterministic``."""

    p: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        return nn.Dropout(rate=self.p, deterministic=deterministic)(x)


class MLP(nn.Module):
    """Token-wise feed-forward: Linear -> GELU -> Drop -> Linear -> Drop.

    (reference: layers/mlp.py:10-63; default hidden ratio 3.0)
    """

    in_channels: int
    out_channels: Optional[int] = None
    hidden_channels: Optional[int] = None
    ratio: float = 3.0
    dropout: float | tuple[float, float] = 0.0
    bias: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out_ch = self.out_channels or self.in_channels
        hidden = self.hidden_channels or int(self.ratio * self.in_channels)
        d1, d2 = to_ntuple(self.dropout, 2)

        x = Linear(self.in_channels, hidden, bias=self.bias, dtype=self.dtype, name="fc1")(x)
        x = _gelu_exact(x)
        x = nn.Dropout(rate=d1, deterministic=deterministic)(x)
        x = Linear(hidden, out_ch, bias=self.bias, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(rate=d2, deterministic=deterministic)(x)
        return x


class Conv(nn.Module):
    """N-D convolution, channels-last, torch-like constructor signature.

    ``padding`` is an integer (symmetric per-dim zero padding), matching the
    reference's torch convs; spatial rank is taken from the input.
    """

    in_channels: int
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    groups: int = 1
    bias: Any = True
    dilation: int | Sequence[int] = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = x.ndim - 2
        ks = to_ntuple(self.kernel_size, p)
        pad = [(q, q) for q in to_ntuple(self.padding, p)]
        fan_in = self.in_channels // self.groups * math.prod(ks)
        return nn.Conv(
            self.out_channels,
            kernel_size=ks,
            strides=to_ntuple(self.stride, p),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=bool(self.bias),
            kernel_dilation=to_ntuple(self.dilation, p),
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class ConvTranspose(nn.Module):
    """N-D transposed convolution, channels-last, torch-like signature.

    With ``kernel_size == stride`` (the U-Net upsample case) this exactly
    doubles/multiplies the spatial size like torch's ConvTransposeNd.
    """

    in_channels: int
    out_channels: int
    kernel_size: int | Sequence[int] = 2
    stride: int | Sequence[int] = 2
    bias: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = x.ndim - 2
        ks = to_ntuple(self.kernel_size, p)
        fan_in = self.in_channels * math.prod(ks)
        return nn.ConvTranspose(
            self.out_channels,
            kernel_size=ks,
            strides=to_ntuple(self.stride, p),
            padding="VALID",
            use_bias=bool(self.bias),
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class GroupNorm(nn.Module):
    """Group normalization over channels-last inputs (torch epsilon)."""

    num_groups: int
    dim: Optional[int] = None  # torch-style (num_groups, num_channels) signature
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps, name="norm")(x)


class InstanceNorm(nn.Module):
    """Instance normalization (per-channel spatial norm), torch defaults.

    torch ``InstanceNormNd`` defaults to ``affine=False``; equivalent to
    GroupNorm with one channel per group and no learned scale/bias.
    """

    dim: int
    eps: float = 1e-5
    affine: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.GroupNorm(
            num_groups=self.dim,
            epsilon=self.eps,
            use_scale=self.affine,
            use_bias=self.affine,
            name="norm",
        )(x)
