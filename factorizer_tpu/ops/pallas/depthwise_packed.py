"""Lane-packed depthwise 3-D convolution (same zero-padding, odd kernels).

The Deconver mixer's multiplicative updates are chains of per-sample
depthwise convolutions (bundle config ``groups: -1`` — reference:
factorizer/factorization/deconvolution.py:21-49).  Round-2 measurements
(PERFORMANCE.md roadmap-4) showed why both XLA's grouped-conv emitter
(~5.3 ms + ~2 ms layout copies per 128^3 conv at C=32) and the v1 Pallas
stencil (~22 ms, ops/pallas/depthwise_conv.py) are far off the ~0.7 ms
bandwidth bound: with C=32 channels in the minor (lane) dimension only a
quarter of the VPU's 128 lanes carry data, and 27 f32 taps are compute
bound at 1/4 occupancy.

This v2 fixes the occupancy with **lane packing**: the trailing ``(S3, C)``
dims are viewed as ``(S3*C/128, 128)`` — a free reshape, since the row-major
bytes are identical — so every VPU op runs on full 128-wide rows carrying
``128/C`` consecutive s3 positions side by side.  The consequences:

* taps offset in dims 1/2 are plain (free) sublane-block slices of a halo
  block, exactly as in v1;
* a tap offset of ``s`` in dim 3 becomes a shift by ``n = s*C`` elements of
  the flattened ``(S3*C)`` axis: one lane roll by ``n mod 128`` plus a
  select between two row (sublane) rolls — computed ONCE per distinct
  ``s`` (``k3`` variants), then reused by all ``k1*k2`` (a, b) offsets;
* out-of-range positions (dim-3 zero padding) are masked with an iota on
  the flat index, so dim 3 is never physically padded (padding would break
  the divisibility of the packed view).

Weights are per-sample per-channel taps ``(B, taps, C)`` tiled to the 128
lanes outside the kernel.  The backward is exact: ``dx`` is the same
stencil with spatially flipped taps (adjoint of zero padding); ``dw``
accumulates per-tap correlation sums in a revisited ``(taps, 128)`` block
and reduces the packed copies outside the kernel.

Eligibility: 3-D channels-last, odd kernel, ``C <= 128``, ``128 % C == 0``,
``S3*C % 128 == 0`` (the flagship Deconver stages at 128^3/64^3 with
C in {32, 64, 128} all qualify; larger-C stages run at tiny spatial dims
where XLA's emitter is already cheap).

2-D (FIVES) support: a ``(B, S1, S2, C)`` depthwise conv with kernel
``(k1, k2)`` is the same kernel viewed as ``(B, 1, S1, S2, C)`` with
``ks = (1, k1, k2)`` — dim-1 tap offsets become (free) sublane-block halo
slices and dim-2 offsets become the packed ``(S2*C)`` shift.  The only
structural change this needs is rectangular grid blocks (``bs1 = 1`` on
the inserted unit dim); see :func:`depthwise_conv2d_packed`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "depthwise_conv2d_packed",
    "depthwise_conv3d_packed",
    "depthwise_conv3d_packed_core",
    "supports_packed",
    "supports_packed_2d",
]

LANES = 128


def _on_tpu() -> bool:
    return any(d.platform == "tpu" for d in jax.devices())


def _block_sizes(s1: int, s2: int) -> tuple[int, int]:
    # prefer larger dim-1/2 blocks: fewer grid steps + smaller halo fraction
    # (measured on v5e at 128^3 C=32: bs=16 kernel 2.1 ms vs bs=8 4.1 ms);
    # per-dim so the 2-D mapping's unit dim takes bs=1 without shrinking the
    # other dim's block
    def one(s: int) -> int:
        for bs in (16, 8, 4, 2, 1):
            if s % bs == 0:
                return bs
        return 0

    return one(s1), one(s2)


def supports_packed(x_shape: tuple[int, ...], ks: tuple[int, ...]) -> bool:
    if len(x_shape) != 5 or len(ks) != 3:
        return False
    if any(k % 2 == 0 for k in ks):
        return False
    _, s1, s2, s3, c = x_shape
    if c > LANES or LANES % c != 0 or (s3 * c) % LANES != 0:
        return False
    # (row rolls wrap within the block; out-of-range rows are masked by the
    # flat-index bound, so no extra row constraint is needed)
    return 0 not in _block_sizes(s1, s2)


def supports_packed_2d(x_shape: tuple[int, ...], ks: tuple[int, ...]) -> bool:
    """Eligibility of the 2-D mapping: ``(B, S1, S2, C)`` with kernel
    ``(k1, k2)`` viewed as ``(B, 1, S1, S2, C)`` / ``(1, k1, k2)``."""
    if len(x_shape) != 4 or len(ks) != 2:
        return False
    b, s1, s2, c = x_shape
    return supports_packed((b, 1, s1, s2, c), (1, *ks))


def _shift_variant(x: Array, n: int, rows: int, s3c: int) -> Array:
    """``v[..., row, lane] = xflat[..., row*128 + lane + n]`` with zeros
    outside ``[0, s3c)`` — the dim-3 tap shift in the packed layout."""
    if n == 0:
        return x
    m = n % LANES  # python semantics: m in [0, 128) for either sign of n
    q = n // LANES  # floor

    def roll(arr, shift, axis, size):
        s = (-shift) % size  # pltpu.roll takes non-negative shifts only
        return pltpu.roll(arr, shift=s, axis=axis) if s else arr

    a = roll(x, m, 3, LANES)
    lo = roll(a, q, 2, rows)
    hi = roll(a, q + 1, 2, rows)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    v = jnp.where(lane < LANES - m, lo, hi) if m else lo
    flat = row * LANES + lane + n
    return jnp.where((flat >= 0) & (flat < s3c), v, 0.0)


def _fwd_kernel(x_ref, w_ref, y_ref, *, ks, bs1, bs2, rows, c, s3):
    # x_ref: (1, bs1+2r1, bs2+2r2, rows, 128) halo block (packed, dims 1/2
    # zero-padded); w_ref: (1, taps, 128); y_ref: (1, bs1, bs2, rows, 128)
    k1, k2, k3 = ks
    x = x_ref[0].astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32)
    acc = jnp.zeros((bs1, bs2, rows, LANES), jnp.float32)
    for cc in range(k3):
        v = _shift_variant(x, (cc - k3 // 2) * c, rows, s3 * c)
        for a in range(k1):
            for b in range(k2):
                t = (a * k2 + b) * k3 + cc
                acc = acc + v[a : a + bs1, b : b + bs2] * w[t]
    y_ref[0] = acc.astype(y_ref.dtype)


def _dw_kernel(x_ref, g_ref, dw_ref, *, ks, bs1, bs2, rows, c, s3):
    # dw[t, lane] += sum_vox g[vox, lane] * shift_t(x)[vox, lane], revisiting
    # one (1, taps, 128) block across the (i, j) grid steps of a batch item.
    k1, k2, k3 = ks
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    i, j = pl.program_id(1), pl.program_id(2)

    part = []
    for cc in range(k3):
        v = _shift_variant(x, (cc - k3 // 2) * c, rows, s3 * c)
        for a in range(k1):
            for b in range(k2):
                prod = g * v[a : a + bs1, b : b + bs2]
                part.append(jnp.sum(prod, axis=(0, 1, 2)))
    # reorder to row-major (k1, k2, k3) tap order
    order = [
        (a * k2 + b) * k3 + cc
        for cc in range(k3)
        for a in range(k1)
        for b in range(k2)
    ]
    inv = [0] * len(order)
    for pos, t in enumerate(order):
        inv[t] = pos
    block = jnp.stack([part[p] for p in inv], axis=0)  # (taps, 128)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dw_ref[0] = block

    @pl.when(jnp.logical_not(jnp.logical_and(i == 0, j == 0)))
    def _():
        dw_ref[0] = dw_ref[0] + block


def _specs(B, s1, s2, rows, r1, r2, bs1, bs2):
    in_spec = pl.BlockSpec(
        (
            pl.Element(1),
            pl.Element(bs1 + 2 * r1),
            pl.Element(bs2 + 2 * r2),
            pl.Element(rows),
            pl.Element(LANES),
        ),
        lambda b, i, j: (b, i * bs1, j * bs2, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, bs1, bs2, rows, LANES),
        lambda b, i, j: (b, i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return in_spec, out_spec


def _fwd_impl(x: Array, w: Array, ks: tuple[int, int, int]) -> Array:
    B, s1, s2, s3, c = x.shape
    xp = x.reshape(B, s1, s2, s3 * c // LANES, LANES)
    return _fwd_packed_impl(xp, w, ks, c).reshape(x.shape)


def _dw_impl(x: Array, g: Array, ks: tuple[int, int, int]) -> Array:
    B, s1, s2, s3, c = x.shape
    xp = x.reshape(B, s1, s2, s3 * c // LANES, LANES)
    gp = g.reshape(B, s1, s2, s3 * c // LANES, LANES)
    return _dw_packed_impl(xp, gp, ks, c)


def _flip_taps(w: Array, ks: tuple[int, int, int]) -> Array:
    B, taps, c = w.shape
    return jnp.flip(w.reshape(B, *ks, c), axis=(1, 2, 3)).reshape(B, taps, c)


# ---- packed-resident entry points ------------------------------------------
# XLA's layout assignment prefers transposed layouts for channels-last
# (..., S3, C<128) tensors (it effectively lane-packs them itself inside its
# fusions), while Mosaic pins pallas operands/results to the standard layout
# — so every natural-shape kernel call is bracketed by multi-ms layout-copy
# pairs (round-3 trace: 31 ms of copies in the Deconver forward).  Keeping a
# conv CHAIN in the packed logical shape ``(B, S1, S2, S3*C/128, 128)``
# makes the pallas boundaries layout-clean: only the chain's endpoints pay
# one conversion each (deconv._update_s_packed uses this).


@functools.lru_cache(maxsize=None)
def _fwd_fn(ks: tuple[int, int, int], c: int, partitioned: bool):
    """Per-config forward callable ``(xp, w) -> y``, GSPMD-sharded along the
    batch dim on multi-device meshes (each shard runs the kernel locally;
    every other dim must stay replicated)."""

    def local(xp, w):
        B, s1, s2, rows, _ = xp.shape
        k1, k2, k3 = ks
        r1, r2 = k1 // 2, k2 // 2
        s3 = rows * LANES // c
        bs1, bs2 = _block_sizes(s1, s2)
        taps = math.prod(ks)
        xpp = jnp.pad(xp, ((0, 0), (r1, r1), (r2, r2), (0, 0), (0, 0)))
        wp = jnp.tile(w, (1, 1, LANES // c))
        in_spec, out_spec = _specs(B, s1, s2, rows, r1, r2, bs1, bs2)
        w_spec = pl.BlockSpec(
            (1, taps, LANES), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel, ks=ks, bs1=bs1, bs2=bs2, rows=rows, c=c, s3=s3
            ),
            out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            grid=(B, s1 // bs1, s2 // bs2),
            in_specs=[in_spec, w_spec],
            out_specs=out_spec,
            interpret=not _on_tpu(),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20),
            cost_estimate=pl.CostEstimate(
                flops=2 * taps * xp.size,
                bytes_accessed=2 * xp.dtype.itemsize * xp.size,
                transcendentals=0,
            ),
        )(xpp, wp)

    if not partitioned:
        return local
    from .partitioning import make_batched_partitioned

    return make_batched_partitioned(
        local, n_batch_dims=1, n_operands=2, operand_ranks=(5, 3),
        n_batched_operands=2,
    )


def _fwd_packed_impl(xp: Array, w: Array, ks: tuple[int, int, int], c: int) -> Array:
    """Packed-resident forward: ``xp (B, S1, S2, rows, 128)`` -> same shape."""
    from .partitioning import multi_device

    return _fwd_fn(tuple(ks), c, multi_device())(xp, w)


@functools.lru_cache(maxsize=None)
def _dw_fn(ks: tuple[int, int, int], c: int, partitioned: bool):
    def local(xp, gp):
        B, s1, s2, rows, _ = xp.shape
        k1, k2, k3 = ks
        r1, r2 = k1 // 2, k2 // 2
        s3 = rows * LANES // c
        bs1, bs2 = _block_sizes(s1, s2)
        taps = math.prod(ks)
        xpp = jnp.pad(xp, ((0, 0), (r1, r1), (r2, r2), (0, 0), (0, 0)))
        in_spec, g_spec = _specs(B, s1, s2, rows, r1, r2, bs1, bs2)
        out_spec = pl.BlockSpec(
            (1, taps, LANES), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            functools.partial(
                _dw_kernel, ks=ks, bs1=bs1, bs2=bs2, rows=rows, c=c, s3=s3
            ),
            out_shape=jax.ShapeDtypeStruct((B, taps, LANES), jnp.float32),
            grid=(B, s1 // bs1, s2 // bs2),
            in_specs=[in_spec, g_spec],
            out_specs=out_spec,
            interpret=not _on_tpu(),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20),
            cost_estimate=pl.CostEstimate(
                flops=3 * taps * xp.size,
                bytes_accessed=2 * xp.dtype.itemsize * xp.size,
                transcendentals=0,
            ),
        )(xpp, gp)

    if not partitioned:
        return local
    from .partitioning import make_batched_partitioned

    return make_batched_partitioned(
        local, n_batch_dims=1, n_operands=2, operand_ranks=(5, 5),
        n_batched_operands=2, result_rank=3,
    )


def _dw_packed_impl(xp: Array, gp: Array, ks: tuple[int, int, int], c: int) -> Array:
    from .partitioning import multi_device

    dw = _dw_fn(tuple(ks), c, multi_device())(xp, gp)
    # fold the packed copies: lane l carries channel l % C
    B, taps = dw.shape[:2]
    return jnp.sum(dw.reshape(B, taps, LANES // c, c), axis=2)



@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv3d_packed_core(xp: Array, w: Array, ks: tuple[int, int, int], c: int) -> Array:
    """Packed-resident depthwise conv: input/output stay in the packed
    logical shape ``(B, S1, S2, S3*C/128, 128)``; ``w`` is ``(B, taps, C)``.
    The backward also stays packed, so chained calls never relayout."""
    return _fwd_packed_impl(xp, w, ks, c)


def _dwcc_fwd(xp, w, ks, c):
    return _fwd_packed_impl(xp, w, ks, c), (xp, w)


def _dwcc_bwd(ks, c, res, g):
    xp, w = res
    dxp = _fwd_packed_impl(g, _flip_taps(w, ks), ks, c).astype(xp.dtype)
    dw = _dw_packed_impl(xp, g, ks, c).astype(w.dtype)
    return dxp, dw


depthwise_conv3d_packed_core.defvjp(_dwcc_fwd, _dwcc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv3d_packed(x: Array, w: Array, ks: tuple[int, int, int]) -> Array:
    """Depthwise 3-D convolution, 'same' zero padding, per-batch taps.

    Args:
        x: ``(B, S1, S2, S3, C)`` channels-last volume.
        w: ``(B, taps, C)`` per-channel taps, tap order row-major over ``ks``
            offsets (cross-correlation orientation, matching
            ``lax.conv_general_dilated`` / torch Conv3d semantics).
        ks: odd kernel sizes per spatial dim; see :func:`supports_packed`.

    Returns:
        Same-shape volume ``y[v, ch] = sum_t w[t, ch] * xpad[v + off_t, ch]``.
    """
    return _fwd_impl(x, w, ks)


def _dwc_fwd(x, w, ks):
    return _fwd_impl(x, w, ks), (x, w)


def _dwc_bwd(ks, res, g):
    x, w = res
    dx = _fwd_impl(g, _flip_taps(w, ks), ks).astype(x.dtype)
    dw = _dw_impl(x, g, ks).astype(w.dtype)
    return dx, dw


depthwise_conv3d_packed.defvjp(_dwc_fwd, _dwc_bwd)


def depthwise_conv2d_packed(x: Array, w: Array, ks: tuple[int, int]) -> Array:
    """Depthwise 2-D convolution, 'same' zero padding, per-batch taps.

    The 2-D FIVES operating points (512^2, C in {32, 64, 128}) run the
    3-D kernel through the ``(B, 1, S1, S2, C)`` view — a free reshape —
    with kernel ``(1, k1, k2)``: dim-1 offsets become sublane halo slices
    and dim-2 offsets the packed shift.  See :func:`supports_packed_2d`.

    Args:
        x: ``(B, S1, S2, C)`` channels-last image batch.
        w: ``(B, taps, C)`` per-channel taps, row-major over ``ks``.
        ks: odd 2-D kernel sizes.
    """
    B, s1, s2, c = x.shape
    y = depthwise_conv3d_packed(x.reshape(B, 1, s1, s2, c), w, (1, *ks))
    return y.reshape(x.shape)
