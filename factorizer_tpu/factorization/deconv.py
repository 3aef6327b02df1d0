"""Blind deconvolution layer: fit ``x ≈ conv(s, h)`` by multiplicative updates.

TPU-native counterpart of the reference Deconv
(reference: factorizer/factorization/deconvolution.py:21-240).  The
reference's reshape-into-groups batching trick (:21-40) is replaced by
``jax.vmap`` over per-sample ``lax.conv_general_dilated`` calls, which XLA
lowers to a single batched convolution — free on TPU and much clearer.
Layout is channels-last ``(B, *spatial, C)``; filters are stored in the
reference's torch layout ``(C, S, *k)`` to ease checkpoint import, and
transposed to ``(*k, in, out)`` at use (a trace-time constant transpose).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange
from jax import Array

from ..layers.basic import Linear
from ..ops.math import relative_error
from ..utils.helpers import as_tuple

__all__ = ["Deconv", "batched_conv", "sconv"]

_DIM_NUMBERS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def batched_conv(s: Array, h: Array, padding: Sequence[tuple[int, int]]) -> Array:
    """Per-sample convolution with per-sample weights.

    Args:
        s: inputs ``(B, *S, C_in)``.
        h: weights ``(B, C_out, C_in, *k)`` (torch weight layout + batch).
        padding: per-spatial-dim ``(lo, hi)`` zero padding.

    Returns:
        ``(B, *S', C_out)``.
    """
    p = s.ndim - 2
    dn = _DIM_NUMBERS[p]

    def one(s1: Array, h1: Array) -> Array:
        rhs = jnp.moveaxis(h1, (0, 1), (-1, -2))  # (*k, C_in, C_out)
        return jax.lax.conv_general_dilated(
            s1[None], rhs, (1,) * p, list(padding), dimension_numbers=dn
        )[0]

    return jax.vmap(one)(s, h)


def sconv(a: Array, b: Array, padding: Sequence[tuple[int, int]]) -> Array:
    """Per-sample channelwise cross-correlation of two feature maps.

    The filter-gradient-like term of the deconvolution updates
    (reference: deconvolution.py:43-49).  Correlates every channel of ``a``
    with every channel of ``b`` over the spatial extent.

    Args:
        a: ``(B, *S, Ca)`` (treated as the input).
        b: ``(B, *S, Cb)`` (treated as the kernel).
        padding: per-spatial-dim ``(lo, hi)`` padding.

    Returns:
        ``(B, Ca, Cb, *out)`` with ``out_i = 2*pad_i + 1`` (= ``k`` for odd k).
    """
    p = a.ndim - 2
    dn = _DIM_NUMBERS[p]

    def one(a1: Array, b1: Array) -> Array:
        lhs = jnp.moveaxis(a1, -1, 0)[..., None]  # (Ca, *S, 1): Ca as batch
        rhs = b1[..., None, :]  # (*S, 1, Cb): spatial extent as kernel
        out = jax.lax.conv_general_dilated(lhs, rhs, (1,) * p, list(padding), dimension_numbers=dn)
        return jnp.moveaxis(out, -1, 1)  # (Ca, Cb, *out)

    return jax.vmap(one)(a, b)


def _kaiming_a5_init(fan_in: int):
    """torch's kaiming_uniform(a=sqrt(5)): U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Deconv(nn.Module):
    """Blind deconvolution layer (the Deconver token mixer core).

    Learns an input-dependent nonnegative source ``s`` (via a linear head) and
    a learnable nonnegative filter bank ``h0``, then refines ``s`` (and
    optionally ``h``) with ``num_iters`` NMF-style multiplicative updates so
    that ``x ≈ conv(s, h)``; returns the source.

    Attributes mirror the reference constructor (deconvolution.py:88-129);
    ``groups == -1`` means depthwise (one group per channel).
    """

    channels: int
    kernel_size: Sequence[int] = (3, 3, 3)
    source_channels: Optional[int] = None
    ratio: float = 4
    groups: int = 8
    update_source: bool = True
    update_filter: bool = False
    eps: float = 1e-16
    num_iters: int = 2
    num_grad_iters: Optional[int] = None
    verbose: bool = False

    def setup(self) -> None:
        self.groups_ = self.channels if self.groups == -1 else self.groups
        if self.channels % self.groups_ != 0:
            raise ValueError("`channels` must be divisible by groups")
        self.source_channels_ = round(
            self.channels * self.ratio / self.groups_
            if self.source_channels is None
            else self.source_channels
        )
        ks = as_tuple(self.kernel_size)
        self.kernel_size_ = ks
        self.padding_ = tuple((k // 2, k // 2) for k in ks)

        fan_in = self.source_channels_ * math.prod(ks)
        self.h0 = self.param(
            "h0",
            _kaiming_a5_init(fan_in),
            (self.channels, self.source_channels_, *ks),
        )
        self.linear = Linear(self.channels, self.groups_ * self.source_channels_)

    # -- group split/merge (channels-last analogues of deconvolution.py:125-126)

    def _split_x(self, x: Array) -> Array:
        return rearrange(x, "b ... (g c) -> (b g) ... c", g=self.groups_)

    def _merge_x(self, x: Array) -> Array:
        return rearrange(x, "(b g) ... c -> b ... (g c)", g=self.groups_)

    def _split_h(self, h: Array) -> Array:
        return rearrange(h, "b (g c) s ... -> (b g) c s ...", g=self.groups_)

    def _merge_h(self, h: Array) -> Array:
        return rearrange(h, "(b g) c s ... -> b (g c) s ...", g=self.groups_)

    # -- core math

    def initialize(self, x: Array) -> tuple[Array, Array]:
        """Nonnegative source (learned head) and filter (shared bank) init."""
        batch = x.shape[0]
        h = jnp.broadcast_to(self.h0, (batch, *self.h0.shape)).astype(x.dtype)
        s = self.linear(x)
        return jax.nn.relu(s), jax.nn.relu(h)

    def _conv(self, s: Array, h: Array) -> Array:
        return batched_conv(s, h, self.padding_)

    def normalize_h(self, h: Array) -> Array:
        axes = tuple(d for d in range(h.ndim) if d not in (0, 2))
        return (h + self.eps) / (jnp.sum(h, axis=axes, keepdims=True) + self.eps)

    def update_s(self, x: Array, s: Array, h: Array) -> Array:
        # x ≈ conv(s, h): multiplicative update on the source.
        h_adj = jnp.flip(jnp.swapaxes(h, 1, 2), axis=tuple(range(3, h.ndim)))
        numerator = self._conv(x, h_adj) + self.eps
        denominator = self._conv(self._conv(s, h), h_adj) + self.eps
        return s * numerator / denominator

    def update_h(self, x: Array, s: Array, h: Array) -> Array:
        # x ≈ conv(s, h): multiplicative update on the filter.
        numerator = sconv(s, x, self.padding_) + self.eps
        denominator = sconv(s, self._conv(s, h), self.padding_) + self.eps
        return h * jnp.swapaxes(numerator / denominator, 1, 2)

    def _update(self, x: Array, s: Array, h: Array) -> tuple[Array, Array]:
        if self.update_source:
            s = self.update_s(x, s, h)
        if self.update_filter:
            h = self.update_h(x, s, h)
        return s, h

    def iterative_update(self, x: Array, s: Array, h: Array) -> tuple[Array, Array]:
        """num_iters multiplicative updates with the reference's gradient truncation.

        No-grad iterations consume stop_gradient inputs; a factor that is not
        updated passes through with its autodiff history intact (matching
        torch.no_grad semantics in deconvolution.py:157-174).
        """
        num_grad = self.num_iters if self.num_grad_iters is None else self.num_grad_iters
        k = self.num_iters - num_grad
        sg = jax.lax.stop_gradient
        for it in range(1, self.num_iters + 1):
            if it <= k:
                s_new, h_new = self._update(sg(x), sg(s), sg(h))
                s = s_new if self.update_source else s
                h = h_new if self.update_filter else h
            else:
                s, h = self._update(x, s, h)
        return s, h

    def fit(self, x: Array) -> tuple[Array, Array]:
        """Return the fitted ``(s, h)`` in merged-channel layout."""
        s, h = self.initialize(x)
        if self.groups_ != 1:
            x, s, h = self._split_x(x), self._split_x(s), self._split_h(h)
        s, h = self.iterative_update(x, s, h)
        if self.groups_ != 1:
            s, h = self._merge_x(s), self._merge_h(h)
        return s, h

    def reconstruct(self, s: Array, h: Array) -> Array:
        if self.groups_ != 1:
            s, h = self._split_x(s), self._split_h(h)
        x_hat = self._conv(s, h)
        if self.groups_ != 1:
            x_hat = self._merge_x(x_hat)
        return x_hat

    def loss(self, x: Array, s: Array, h: Array) -> Array:
        if self.groups_ != 1:
            x = self._split_x(x)
            s, h = self._split_x(s), self._split_h(h)
        return relative_error(x, self._conv(s, h))

    def __call__(self, x: Array) -> Array:
        s, h = self.initialize(x)
        if self.groups_ != 1:
            x, s, h = self._split_x(x), self._split_x(s), self._split_h(h)
        s, _ = self.iterative_update(x, s, h)
        if self.groups_ != 1:
            s = self._merge_x(s)
        return s
