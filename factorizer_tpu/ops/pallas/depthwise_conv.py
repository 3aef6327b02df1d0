"""Fused depthwise 3-D convolution (same zero-padding, odd kernels).

The Deconver mixer's multiplicative updates are chains of depthwise
convolutions (``groups == channels``, the bundle configuration
``groups: -1`` — reference: factorizer/factorization/deconvolution.py:21-49
with one source channel per group).  XLA:TPU's grouped-conv emitter handles
these poorly at volume scale: each 128^3 depthwise conv lowers to a ~3 ms
windowed emitter fusion plus a ~2 ms layout copy (round-2 trace), about 6x
the bandwidth bound.  This kernel computes the 27-tap stencil directly in
VMEM: one read of the (wrap-free, zero-padded) volume, 27 shifted
multiply-adds on the VPU, one write.

Layout: channels-last ``(B, S1, S2, S3, C)`` with per-channel taps
``w (B, prod(k), C)``.  Blocks are ``(1, bs, bs, S3, C)`` output tiles read
with a halo from the padded input — the contiguous ``(S3+2r, C)`` planes
make 16 KB+ DMA runs.

Backward: ``dx`` is the same stencil with spatially-flipped taps (exact
adjoint of zero padding); ``dw`` is a second kernel that accumulates the 27
per-channel correlation sums into one ``(B, taps, C)`` block revisited
across grid steps (Pallas keeps the block in VMEM between consecutive steps
that map to the same output block).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["depthwise_conv3d", "supports_depthwise"]


def _on_tpu() -> bool:
    return any(d.platform == "tpu" for d in jax.devices())


def supports_depthwise(x_shape: tuple[int, ...], ks: tuple[int, ...]) -> bool:
    """Eligibility: 3-D channels-last volume, odd cubic-rank kernel, spatial
    dims divisible by the block size."""
    if len(x_shape) != 5 or len(ks) != 3:
        return False
    if any(k % 2 == 0 for k in ks):
        return False
    _, s1, s2, s3, _ = x_shape
    bs = _block_size(s1, s2)
    return bs > 0 and s1 % bs == 0 and s2 % bs == 0


def _block_size(s1: int, s2: int) -> int:
    for bs in (8, 4, 2, 1):
        if s1 % bs == 0 and s2 % bs == 0:
            return bs
    return 0


def _fwd_kernel(x_ref, w_ref, y_ref, *, ks: tuple[int, int, int], bs: int, s3: int):
    # x_ref: (1, bs+2r1, bs+2r2, S3+2r3, C) halo block of the padded volume
    # w_ref: (1, taps, C); y_ref: (1, bs, bs, S3, C)
    k1, k2, k3 = ks
    x = x_ref[0].astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32)
    acc = None
    t = 0
    for a in range(k1):
        for b in range(k2):
            for c in range(k3):
                term = x[a : a + bs, b : b + bs, c : c + s3, :] * w[t]
                acc = term if acc is None else acc + term
                t += 1
    y_ref[0] = acc.astype(y_ref.dtype)


def _dw_kernel(x_ref, g_ref, dw_ref, *, ks: tuple[int, int, int], bs: int, s3: int):
    # Accumulates dw[t, ch] = sum_vox g[vox, ch] * xpad[vox + off_t, ch] into
    # a (1, taps, C) block shared by every (i, j) grid step of one batch item.
    k1, k2, k3 = ks
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    i, j = pl.program_id(1), pl.program_id(2)

    part = []  # tap order: row-major over (k1, k2, k3) offsets
    for a in range(k1):
        for b in range(k2):
            for c in range(k3):
                prod = g * x[a : a + bs, b : b + bs, c : c + s3, :]
                part.append(jnp.sum(prod, axis=(0, 1, 2)))
    block = jnp.stack(part, axis=0)  # (taps, C)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dw_ref[0] = block

    @pl.when(jnp.logical_not(jnp.logical_and(i == 0, j == 0)))
    def _():
        dw_ref[0] = dw_ref[0] + block


def _pad_spatial(x: Array, ks: tuple[int, int, int]) -> Array:
    r = [k // 2 for k in ks]
    return jnp.pad(
        x, ((0, 0), (r[0], r[0]), (r[1], r[1]), (r[2], r[2]), (0, 0))
    )


def _fwd_impl(x: Array, w: Array, ks: tuple[int, int, int]) -> Array:
    B, s1, s2, s3, c = x.shape
    bs = _block_size(s1, s2)
    r = [k // 2 for k in ks]
    xp = _pad_spatial(x, ks)
    taps = math.prod(ks)

    # Halo-overlapping reads need element indexing for the spatial dims.
    in_spec = pl.BlockSpec(
        (
            pl.Element(1),
            pl.Element(bs + 2 * r[0]),
            pl.Element(bs + 2 * r[1]),
            pl.Element(s3 + 2 * r[2]),
            pl.Element(c),
        ),
        lambda b, i, j: (b, i * bs, j * bs, 0, 0),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec((1, taps, c), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, bs, bs, s3, c), lambda b, i, j: (b, i, j, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ks=ks, bs=bs, s3=s3),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B, s1 // bs, s2 // bs),
        in_specs=[in_spec, w_spec],
        out_specs=out_spec,
        interpret=not _on_tpu(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * taps * x.size,
            bytes_accessed=2 * x.dtype.itemsize * x.size,
            transcendentals=0,
        ),
    )(xp, w)


def _dw_impl(x: Array, g: Array, ks: tuple[int, int, int]) -> Array:
    B, s1, s2, s3, c = x.shape
    bs = _block_size(s1, s2)
    r = [k // 2 for k in ks]
    xp = _pad_spatial(x, ks)
    taps = math.prod(ks)

    in_spec = pl.BlockSpec(
        (
            pl.Element(1),
            pl.Element(bs + 2 * r[0]),
            pl.Element(bs + 2 * r[1]),
            pl.Element(s3 + 2 * r[2]),
            pl.Element(c),
        ),
        lambda b, i, j: (b, i * bs, j * bs, 0, 0),
        memory_space=pltpu.VMEM,
    )
    g_spec = pl.BlockSpec(
        (1, bs, bs, s3, c), lambda b, i, j: (b, i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, taps, c), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, ks=ks, bs=bs, s3=s3),
        out_shape=jax.ShapeDtypeStruct((B, taps, c), jnp.float32),
        grid=(B, s1 // bs, s2 // bs),
        in_specs=[in_spec, g_spec],
        out_specs=out_spec,
        interpret=not _on_tpu(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=3 * taps * x.size,
            bytes_accessed=2 * x.dtype.itemsize * x.size,
            transcendentals=0,
        ),
    )(xp, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv3d(x: Array, w: Array, ks: tuple[int, int, int]) -> Array:
    """Depthwise 3-D convolution, 'same' zero padding, per-batch taps.

    Args:
        x: ``(B, S1, S2, S3, C)`` channels-last volume.
        w: ``(B, taps, C)`` per-channel taps, tap order row-major over
            ``ks`` offsets (cross-correlation orientation, matching
            ``lax.conv_general_dilated`` / torch Conv3d semantics).
        ks: odd kernel sizes per spatial dim.

    Returns:
        Same-shape volume ``y[v, ch] = sum_t w[t, ch] * xpad[v + off_t, ch]``.
    """
    return _fwd_impl(x, w, ks)


def _flip_taps(w: Array, ks: tuple[int, int, int]) -> Array:
    B, taps, c = w.shape
    return jnp.flip(w.reshape(B, *ks, c), axis=(1, 2, 3)).reshape(B, taps, c)


def _dwc_fwd(x, w, ks):
    return _fwd_impl(x, w, ks), (x, w)


def _dwc_bwd(ks, res, g):
    x, w = res
    # Adjoint of the zero-padded cross-correlation: correlate g with the
    # spatially flipped taps; dw is the per-tap correlation of g with x.
    dx = _fwd_impl(g, _flip_taps(w, ks), ks).astype(x.dtype)
    dw = _dw_impl(x, g, ks).astype(w.dtype)
    return dx, dw


depthwise_conv3d.defvjp(_dwc_fwd, _dwc_bwd)
