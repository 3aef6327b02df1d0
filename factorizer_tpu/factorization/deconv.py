"""Blind deconvolution layer: fit ``x ≈ conv(s, h)`` by multiplicative updates.

TPU-native counterpart of the reference Deconv
(reference: factorizer/factorization/deconvolution.py:21-240).  The
reference's reshape-into-groups batching trick (:21-40) — splitting the
channel groups into the batch dimension — is replaced by native grouped
convolutions (``feature_group_count``): on TPU the split layout leaves
tensors with tiny minor channel dims (1-4 channels for the depthwise
``groups=-1`` bundle config) that get padded up to the 128-lane tile, a
64-128x memory blowup that OOMs at 128^3.  Keeping channels merged keeps
the lane dim full.  Layout is channels-last ``(B, *spatial, C)``; filters
are stored in the reference's torch layout ``(C, S, *k)`` to ease checkpoint
import, and transposed to ``(*k, in, out)`` at use (a trace-time constant
transpose).  Solver math runs in float32 regardless of the activation dtype
(same policy as the fused NMF kernels: bf16-unsafe ``eps`` denominators).
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


def batched_conv(
    s: Array,
    h: Array,
    padding: Sequence[tuple[int, int]],
    groups: int = 1,
) -> Array:
    """Per-sample (optionally grouped) convolution with per-sample weights.

    Args:
        s: inputs ``(B, *S, C_in)`` with ``C_in = groups * in_per_group``,
            group-major channel order.
        h: weights ``(B, C_out, in_per_group, *k)`` (torch grouped-conv weight
            layout + batch), ``C_out`` group-major.
        padding: per-spatial-dim ``(lo, hi)`` zero padding.
        groups: feature group count (grouped conv stays in merged-channel
            layout — the TPU-friendly formulation of the reference's
            batch-into-groups trick, deconvolution.py:21-40).

    Returns:
        ``(B, *S', C_out)``.
    """
    p = s.ndim - 2
    dn = _DIM_NUMBERS[p]

    if _use_depthwise_kernel(s, h, padding, groups):
        ks = tuple(h.shape[3:])
        B, c = h.shape[0], h.shape[1]
        w = jnp.transpose(h[:, :, 0].reshape(B, c, -1), (0, 2, 1))  # (B, taps, C)
        from ..ops.pallas.depthwise_packed import (
            depthwise_conv2d_packed,
            depthwise_conv3d_packed,
            supports_packed,
        )

        if s.ndim == 4:  # 2-D route is packed-only (checked by the gate)
            return depthwise_conv2d_packed(s, w, ks)
        if USE_PACKED_DEPTHWISE and supports_packed(s.shape, ks):
            return depthwise_conv3d_packed(s, w, ks)
        from ..ops.pallas.depthwise_conv import depthwise_conv3d

        return depthwise_conv3d(s, w, ks)

    if 1 < groups < s.shape[-1]:
        # XLA:TPU's general grouped-conv emitter materializes temps with the
        # group dims minor — 64x lane-padding blowups that OOM at volume
        # scale (measured: an 8 GB temp for a 128 MB logical tensor at
        # groups=8, 128^3).  Expand the weights to a block-diagonal dense
        # kernel instead: identical math (off-block weights are zero), dense
        # weights are small (<= C_out*C_in*prod(k)), and the dense emitter is
        # well-behaved.  Depthwise (groups == channels) stays on the grouped
        # path, which XLA special-cases efficiently.
        groups, h = 1, _block_diag_weights(h, groups)

    def one(s1: Array, h1: Array) -> Array:
        rhs = jnp.moveaxis(h1, (0, 1), (-1, -2))  # (*k, in_per_group, C_out)
        return jax.lax.conv_general_dilated(
            s1[None], rhs, (1,) * p, list(padding),
            dimension_numbers=dn, feature_group_count=groups,
        )[0]

    return jax.vmap(one)(s, h)


def _block_diag_weights(h: Array, groups: int) -> Array:
    """(B, C_out, in_per_group, *k) grouped weights -> dense block-diagonal
    (B, C_out, groups*in_per_group, *k), group-major on both channel axes."""
    B, c_out, ipg, *ks = h.shape
    cg = c_out // groups
    hr = h.reshape(B, groups, cg, 1, ipg, *ks)
    mask = jnp.eye(groups, dtype=h.dtype).reshape(
        groups, 1, groups, 1, *([1] * len(ks))
    )
    hd = hr * mask  # (B, g, cg, g, ipg, *k), zero off the diagonal blocks
    return hd.reshape(B, c_out, groups * ipg, *ks)


# Depthwise Pallas kernel routing.  The lane-packed v2
# (ops/pallas/depthwise_packed.py) is the default on TPU: it packs 128/C
# consecutive s3 positions into the VPU lanes so the 27-tap stencil runs at
# full lane occupancy (the round-2 v1 kernels ran at C/128 occupancy and
# LOST to XLA's emitter — v1 is kept in ops/pallas/depthwise_conv.py as the
# documented starting point and interpret-mode oracle, gated off).
import os as _os

USE_PACKED_DEPTHWISE = _os.environ.get("FTX_PACKED_DEPTHWISE", "1") != "0"
USE_PALLAS_DEPTHWISE = False  # the v1 stencil; measured slower than XLA


def _use_depthwise_kernel(s: Array, h: Array, padding, groups: int) -> bool:
    """Route depthwise 'same'-padded convs (3-D, and 2-D through the packed
    unit-dim view) through a Pallas stencil kernel on TPU.  CPU keeps the
    lax path."""
    if s.ndim not in (4, 5) or groups != s.shape[-1]:
        return False
    if h.shape[1] != groups or h.shape[2] != 1:
        return False
    ks = tuple(h.shape[3:])
    if any(lo != k // 2 or hi != k // 2 for (lo, hi), k in zip(padding, ks)):
        return False
    if not any(d.platform == "tpu" for d in jax.devices()):
        return False
    if s.ndim == 4:
        if not USE_PACKED_DEPTHWISE:
            return False
        from ..ops.pallas.depthwise_packed import supports_packed_2d

        return supports_packed_2d(s.shape, ks)
    if USE_PACKED_DEPTHWISE:
        from ..ops.pallas.depthwise_packed import supports_packed

        if supports_packed(s.shape, ks):
            return True
    if USE_PALLAS_DEPTHWISE:
        from ..ops.pallas.depthwise_conv import supports_depthwise

        return supports_depthwise(s.shape, ks)
    return False


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
    dtype: Optional[jnp.dtype] = None  # compute dtype of the source head;
    # the multiplicative-update math itself always runs in >= float32

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
        self.linear = Linear(
            self.channels, self.groups_ * self.source_channels_, dtype=self.dtype
        )

    # -- group split/merge (channels-last analogues of deconvolution.py:125-126;
    #    only the rare update_filter path uses the split layout — see module doc)

    def _split_x(self, x: Array) -> Array:
        return rearrange(x, "b ... (g c) -> (b g) ... c", g=self.groups_)

    def _merge_x(self, x: Array) -> Array:
        return rearrange(x, "(b g) ... c -> b ... (g c)", g=self.groups_)

    def _split_h(self, h: Array) -> Array:
        return rearrange(h, "b (g c) s ... -> (b g) c s ...", g=self.groups_)

    def _merge_h(self, h: Array) -> Array:
        return rearrange(h, "(b g) c s ... -> b (g c) s ...", g=self.groups_)

    # -- core math (merged-channel layout: x (B,*S,C), s (B,*S,g*sc),
    #    h (B, C, sc, *k) group-major)

    def initialize(self, x: Array) -> tuple[Array, Array]:
        """Nonnegative source (learned head) and filter (shared bank) init."""
        batch = x.shape[0]
        h = jnp.broadcast_to(self.h0, (batch, *self.h0.shape)).astype(x.dtype)
        s = self.linear(x)
        return jax.nn.relu(s), jax.nn.relu(h)

    def _solve_dtype(self, x: Array) -> jnp.dtype:
        """Multiplicative updates run in >= f32 (eps=1e-16 is bf16-unsafe)."""
        return x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32

    def _conv(self, s: Array, h: Array) -> Array:
        """``conv(s, h)``: source (g*sc ch) -> signal (C ch), grouped."""
        return batched_conv(s, h, self.padding_, self.groups_)

    def _adjoint_h(self, h: Array) -> Array:
        """Adjoint filter: (B, C, sc, *k) -> (B, g*sc, C/g, *k), spatially flipped."""
        B = h.shape[0]
        g, cg, sc = self.groups_, self.channels // self.groups_, self.source_channels_
        ha = h.reshape(B, g, cg, sc, *self.kernel_size_)
        ha = jnp.swapaxes(ha, 2, 3).reshape(B, g * sc, cg, *self.kernel_size_)
        return jnp.flip(ha, axis=tuple(range(3, ha.ndim)))

    def normalize_h(self, h: Array) -> Array:
        # Per-group filter normalization (reference: deconvolution.py, on the
        # split layout where dims (0, 2) are batch*group and source channel).
        hs = self._split_h(h)
        axes = tuple(d for d in range(hs.ndim) if d not in (0, 2))
        hs = (hs + self.eps) / (jnp.sum(hs, axis=axes, keepdims=True) + self.eps)
        return self._merge_h(hs)

    def update_s(self, x: Array, s: Array, h: Array) -> Array:
        # x ≈ conv(s, h): multiplicative update on the source (merged layout;
        # reference: deconvolution.py:136-141 on the split layout).
        h_adj = self._adjoint_h(h)
        if self._packed_chain_eligible(x, s, h):
            return self._update_s_packed(x, s, h, h_adj)
        numerator = batched_conv(x, h_adj, self.padding_, self.groups_) + self.eps
        denominator = (
            batched_conv(self._conv(s, h), h_adj, self.padding_, self.groups_)
            + self.eps
        )
        return s * numerator / denominator

    def _packed_chain_eligible(self, x: Array, s: Array, h: Array) -> bool:
        """Depthwise update chains run packed-resident when the kernel
        applies: the three convs and the elementwise ratio stay in the
        packed ``(B, S1, S2, S3*C/128, 128)`` logical shape, so only the
        chain endpoints pay a layout conversion (round-3 trace: per-conv
        natural<->packed conversions were 31 ms of the 92 ms Deconver
        forward — XLA's preferred layouts for (..., C<128) tensors clash
        with Mosaic's standard-layout operands at every kernel boundary)."""
        if not USE_PACKED_DEPTHWISE:
            return False
        if self.groups_ != self.channels or self.source_channels_ != 1:
            return False
        if x.shape != s.shape or x.ndim not in (4, 5):
            return False
        if not any(d.platform == "tpu" for d in jax.devices()):
            return False
        from ..ops.pallas.depthwise_packed import supports_packed, supports_packed_2d

        if x.ndim == 4:
            return supports_packed_2d(x.shape, self.kernel_size_)
        return supports_packed(x.shape, self.kernel_size_)

    def _update_s_packed(self, x: Array, s: Array, h: Array, h_adj: Array) -> Array:
        from ..ops.pallas.depthwise_packed import depthwise_conv3d_packed_core

        ks = self.kernel_size_
        B, c = x.shape[0], x.shape[-1]
        if x.ndim == 4:  # 2-D: the (B, 1, S1, S2, C) unit-dim view (free)
            _, s1, s2, _ = x.shape
            s1, s2, s3 = 1, s1, s2
            ks = (1, *ks)
        else:
            _, s1, s2, s3, _ = x.shape
        rows = s3 * c // 128

        def taps(hh):
            return jnp.transpose(hh[:, :, 0].reshape(B, c, -1), (0, 2, 1))

        w, w_adj = taps(h), taps(h_adj)
        xp = x.reshape(B, s1, s2, rows, 128)
        sp = s.reshape(B, s1, s2, rows, 128)
        num = depthwise_conv3d_packed_core(xp, w_adj, ks, c) + self.eps
        rec = depthwise_conv3d_packed_core(sp, w, ks, c)
        den = depthwise_conv3d_packed_core(rec, w_adj, ks, c) + self.eps
        return (sp * num / den).reshape(x.shape)

    def update_h(self, x: Array, s: Array, h: Array) -> Array:
        # x ≈ conv(s, h): multiplicative update on the filter (rare path,
        # update_filter=True only; runs in the reference's split layout).
        xs, ss, hs = self._split_x(x), self._split_x(s), self._split_h(h)
        numerator = sconv(ss, xs, self.padding_) + self.eps
        denominator = (
            sconv(ss, batched_conv(ss, hs, self.padding_), self.padding_) + self.eps
        )
        return self._merge_h(hs * jnp.swapaxes(numerator / denominator, 1, 2))

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

    def _initialize_solve(self, x: Array) -> tuple[Array, Array, Array]:
        """Solve-dtype ``(x, s, h)`` without a lossy intermediate downcast:
        the linear head's (>= f32) output and the f32 ``h0`` go straight to
        the solve dtype instead of round-tripping through a bf16 ``x.dtype``.
        """
        dt = self._solve_dtype(x)
        batch = x.shape[0]
        h = jnp.broadcast_to(self.h0, (batch, *self.h0.shape)).astype(dt)
        s = self.linear(x).astype(dt)
        return x.astype(dt), jax.nn.relu(s), jax.nn.relu(h)

    def fit(self, x: Array) -> tuple[Array, Array]:
        """Return the fitted ``(s, h)`` in merged-channel layout."""
        out_dtype = x.dtype
        xs, s, h = self._initialize_solve(x)
        s, h = self.iterative_update(xs, s, h)
        return s.astype(out_dtype), h.astype(out_dtype)

    def reconstruct(self, s: Array, h: Array) -> Array:
        return self._conv(s, h)

    def loss(self, x: Array, s: Array, h: Array) -> Array:
        # Reference semantics: per-(batch*group) relative error on the split
        # layout (deconvolution.py loss over grouped tensors) — a (B*g,)
        # vector of per-group ratios, not one joint ratio per batch item.
        if self.groups_ != 1:
            x, s, h = self._split_x(x), self._split_x(s), self._split_h(h)
            return relative_error(x, batched_conv(s, h, self.padding_))
        return relative_error(x, self._conv(s, h))

    def __call__(self, x: Array) -> Array:
        out_dtype = x.dtype
        xs, s, h = self._initialize_solve(x)
        s, _ = self.iterative_update(xs, s, h)
        return s.astype(out_dtype)
