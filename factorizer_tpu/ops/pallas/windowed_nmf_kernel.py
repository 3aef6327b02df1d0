"""Fused windowed-NMF Pallas kernel: fold -> solve -> unfold in one pass.

The Factorizer mixer's data path is ``matricize (transpose) -> NMF ->
inverse matricize (transpose)``.  Under XLA each transpose materializes the
full matricized tensor in HBM, which dominates the mixer's runtime
(PERFORMANCE.md: ~130 ms of the 267 ms bf16 flagship forward is fold/unfold
transposes plus the layout copies XLA inserts around them).  This kernel
instead streams the volume through VMEM and solves the rank-1 factorization
*in the volume's own layout* — the matricized tensor never exists, so the
mixer core costs one HBM read + one write per shift.

v2 blocking (this file): each grid step loads a full row of windows along
the contiguous last spatial axis — block ``(1, p, p, S3, C)`` — so DMA runs
are ``S3*C`` elements (8 KB+ at the flagship config) instead of v1's 1 KB
per-window strides, and all ``g3 = S3/p`` windows of the row are solved
together.  (v1, one window per block, measured 87 ms vs ~30 ms for the
transpose path at stage-0 scale; v2 wins — see PERFORMANCE.md.)

Key trick (Mosaic supports no lane-splitting reshapes): the per-window
factor ``u`` lives channel-shaped ``(g3, C)`` and ``v`` lives patch-shaped
``(p*p, g3, p, C)``, constant across the ``head_dim`` channels of each head.
The only cross-channel coupling — per-head sums for the Gram terms — is a
multiply by a precomputed block-diagonal head mask ``M in {0,1}^{C x C}``,
i.e. one small MXU matmul per update:

    a_u[w, c]      = sum_q x * v               (elementwise + sublane reduce)
    b_u[w, c]      = sum_q v * v               (constant across a head)
    a_v[q, w, c]   = (x * u) @ M               (head-sum, broadcast back)
    b_v[w, c]      = (u * u) @ M

which reproduces the reference HALS/MU updates exactly
(matrix_factorization.py:210-247 specialized to rank 1).  Shifted-window
copies are handled by the caller with ``jnp.roll`` (activation and roll
commute with the fold).

Backward runs the same field-form math as a second Pallas kernel that
differentiates the block-local solve with ``jax.vjp`` *inside* the kernel —
forward recompute and backprop both stay in VMEM, so the VJP also costs one
read of ``(x, g)`` + one write of ``dx`` instead of the multi-pass XLA
recompute (incl. the ``num_grad_steps`` truncation semantics,
matrix_factorization.py:506-512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nmf_kernel import _SOLVER_ITERS

__all__ = [
    "windowed_nmf_reconstruct",
    "windowed_nmf_multi",
    "xla_windowed_nmf_reconstruct",
    "supports_windowed",
]

EPS = 1e-16


def supports_windowed(
    x_shape: tuple[int, ...], head_dim: int, patch: int, solver: str, rank: int
) -> bool:
    """Eligibility: 3-D channels-last volume, cubic patches, rank 1, hals/mu."""
    if len(x_shape) != 5 or rank != 1 or solver not in ("hals", "mu"):
        return False
    _, s1, s2, s3, c = x_shape
    return (
        c % head_dim == 0
        and s1 % patch == 0
        and s2 % patch == 0
        and s3 % patch == 0
    )


def _fold(x: Array, head_dim: int, patch: int) -> Array:
    """Reference matricize on a channels-last volume: -> (B*H, G, d, p^3)."""
    B, s1, s2, s3, c = x.shape
    h = c // head_dim
    g1, g2, g3 = s1 // patch, s2 // patch, s3 // patch
    x = x.reshape(B, g1, patch, g2, patch, g3, patch, h, head_dim)
    x = jnp.transpose(x, (0, 7, 1, 3, 5, 8, 2, 4, 6))  # B h g1 g2 g3 d p p p
    return x.reshape(B * h, g1 * g2 * g3, head_dim, patch**3)


def _unfold(y: Array, shape: tuple[int, ...], head_dim: int, patch: int) -> Array:
    B, s1, s2, s3, c = shape
    h = c // head_dim
    g1, g2, g3 = s1 // patch, s2 // patch, s3 // patch
    y = y.reshape(B, h, g1, g2, g3, head_dim, patch, patch, patch)
    y = jnp.transpose(y, (0, 2, 6, 3, 7, 4, 8, 1, 5))
    return y.reshape(shape)


def xla_windowed_nmf_reconstruct(
    x: Array, u0: Array, v0: Array, head_dim: int, patch: int,
    solver: str, num_iters: int, eps: float = EPS,
) -> Array:
    """Reference path: explicit fold -> iterated solve -> unfold (pure XLA)."""
    m = _fold(x, head_dim, patch).astype(jnp.float32)
    it = _SOLVER_ITERS[solver]
    batch = m.shape[:-2]
    u = jnp.broadcast_to(u0, (*batch, *u0.shape)).astype(jnp.float32)
    v = jnp.broadcast_to(v0, (*batch, *v0.shape)).astype(jnp.float32)
    for _ in range(num_iters):
        u, v = it(m, u, v, eps)
    y = jnp.matmul(u, jnp.swapaxes(v, -1, -2), precision=jax.lax.Precision.HIGHEST)
    return _unfold(y, x.shape, head_dim, patch).astype(x.dtype)


def _solve_field(x4: Array, u0b: Array, v0p: Array, mask: Array, *, patch: int,
                 solver: str, num_iters: int, eps: float,
                 precision=jax.lax.Precision.HIGHEST) -> Array:
    """Rank-1 windowed solve in field form on a row of windows.

    Args:
        x4: ``(p*p, g3, p, C)`` float32 — one row of ``g3`` windows.
        u0b: ``(1, C)`` u0 tiled across heads.
        v0p: ``(p*p, p)`` v0 reshaped to patch layout.
        mask: ``(C, C)`` block-diagonal head indicator.

    Returns:
        ``u v^T`` per window/head, same field shape as ``x4``.
    """
    u, v = _field_iterates(
        x4, u0b, v0p, mask, patch=patch, solver=solver, num_iters=num_iters,
        eps=eps, precision=precision,
    )
    return u[None, :, None, :] * v



def _pick_pack(c: int, g3: int, s3: int) -> int:
    """Windows to pack into the lane dim: largest power of two with
    ``pack*C <= 128`` (full lanes) that divides the window count and keeps
    the packed chunk sublane-aligned (``S3/pack`` a multiple of 8 — Mosaic
    cannot concat vector slices at non-zero sublane offsets)."""
    pack = 1
    while (
        c * pack * 2 <= 128
        and g3 % (pack * 2) == 0
        and (s3 // (pack * 2)) % 8 == 0
    ):
        pack *= 2
    return pack


def _pack_lanes(x: Array, pack: int) -> Array:
    """(p, p, S3, C) -> (p, p, S3/pack, pack*C): side-by-side window groups.

    At stage-0 scale C=32 uses a quarter of the 128 VPU lanes; packing
    ``pack`` independent windows into the lane dim makes every elementwise
    pass (and the head-sum matmul) run at full lane occupancy.  The field
    math is unchanged — it just sees ``pack*g3/pack`` windows of ``pack*C``
    channels with a block-diagonal mask extended accordingly.
    """
    if pack == 1:
        return x
    s3 = x.shape[-2]
    chunk = s3 // pack
    return jnp.concatenate(
        [x[..., k * chunk : (k + 1) * chunk, :] for k in range(pack)], axis=-1
    )


def _pack_lanes_xla(x: Array, pack: int) -> Array:
    """XLA-side ``_pack_lanes``: the same chunked permutation written as
    reshape -> transpose -> reshape.  In-kernel code must keep the
    concat-of-slices form (Mosaic cannot lane-split reshapes), but on the
    XLA side the explicit transpose is the better spelling: layout
    assignment absorbs it into the neighbouring dot / pad fusion instead
    of emitting the standalone relayout copy + split-fusion pair the
    concat lowers to (measured: -10.8 ms per stage-0 block fwd+bwd)."""
    if pack == 1:
        return x
    *lead, s3, c = x.shape
    y = x.reshape(*lead, pack, s3 // pack, c)
    y = jnp.moveaxis(y, -3, -2)
    return y.reshape(*lead, s3 // pack, pack * c)


def _roll3_packed_xla(t: Array, r: int, pack: int, c: int) -> Array:
    """``jnp.roll`` by ``r`` along the NATURAL dim-3 axis, applied in the
    lane-packed view ``(..., S3/pack, pack*C)`` (see ``_pack_lanes``): a
    within-chunk sublane roll plus lane-group rolls with a chunk-boundary
    select — the XLA-side mirror of the in-kernel ``_roll_packed3``.
    Since round 4 the shift kernels unroll dim 3 on-chip before the write,
    so this is no longer on the hot path; it is kept as the property-tested
    reference for the in-kernel roll (tests/test_pallas.py).
    """
    if pack == 1:
        return jnp.roll(t, r, axis=-2)
    chunk, cp = t.shape[-2], t.shape[-1]
    r = r % (chunk * pack)
    if r == 0:
        return t
    q, m = divmod(r, chunk)
    a = jnp.roll(t, m, axis=-2) if m else t
    lo_sh = (q * c) % cp
    lo = jnp.roll(a, lo_sh, axis=-1) if lo_sh else a
    if m == 0:
        return lo
    hi_sh = ((q + 1) * c) % cp
    hi = jnp.roll(a, hi_sh, axis=-1) if hi_sh else a
    g = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 2)
    return jnp.where(g >= m, lo, hi)


def _unpack_lanes_xla(yp: Array, pack: int, c: int) -> Array:
    """Undo lane packing OUTSIDE the kernel: (..., S3/pack, pack*C) ->
    (..., S3, C).  Mosaic cannot relayout lane-offset slices for a sublane
    concat, so kernels emit the packed layout and XLA (which fuses this into
    the adjacent roll/average pass) unpacks.
    """
    if pack == 1:
        return yp
    *lead, s3p, cp = yp.shape
    y = yp.reshape(*lead, s3p, pack, cp // pack)
    y = jnp.moveaxis(y, -2, -3)
    return y.reshape(*lead, s3p * pack, cp // pack)

def _kernel(x_ref, u0b_ref, v0p_ref, mask_ref, y_ref, *, patch: int,
            solver: str, num_iters: int, eps: float,
            precision=jax.lax.Precision.HIGHEST, pack: int = 1):
    # Block: (1, p, p, S3, C) — a full row of g3 = S3/p windows, with
    # `pack` windows packed into the lane dim (see _pack_lanes).
    p = patch
    _, _, _, s3, c = x_ref.shape
    s3p, cp = s3 // pack, c * pack
    x = _pack_lanes(x_ref[0].astype(jnp.float32), pack)
    y = _solve_field(
        x.reshape(p * p, s3p // p, p, cp),
        u0b_ref[...].astype(jnp.float32), v0p_ref[...].astype(jnp.float32),
        mask_ref[...].astype(jnp.float32),
        patch=patch, solver=solver, num_iters=num_iters, eps=eps,
        precision=precision,
    )
    # Output stays lane-packed; the caller unpacks in XLA (see
    # _unpack_lanes_xla — Mosaic cannot do the reverse relayout).
    y_ref[0] = y.reshape(p, p, s3p, cp).astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, u0b_ref, v0p_ref, mask_ref, dx_ref, *, patch: int,
                solver: str, num_iters: int, num_grad_steps, eps: float,
                precision=jax.lax.Precision.HIGHEST, pack: int = 1):
    """VJP of the block-local solve, computed entirely in VMEM."""
    p = patch
    _, _, _, s3, c = x_ref.shape
    s3p, cp = s3 // pack, c * pack
    g3 = s3p // p
    x = _pack_lanes(x_ref[0].astype(jnp.float32), pack).reshape(p * p, g3, p, cp)
    g = _pack_lanes(g_ref[0].astype(jnp.float32), pack).reshape(p * p, g3, p, cp)
    u0b = u0b_ref[...].astype(jnp.float32)
    v0p = v0p_ref[...].astype(jnp.float32)
    mask = mask_ref[...].astype(jnp.float32)

    num_grad = num_iters if num_grad_steps is None else num_grad_steps
    k = num_iters - num_grad

    def f(x_in):
        # Mirror MatrixFactorization.decompose's stop_gradient phases: the
        # first k iterations consume a non-differentiable copy of x.
        if k >= num_iters:
            x_head = jax.lax.stop_gradient(x_in)
            return _solve_field(
                x_head, u0b, v0p, mask,
                patch=patch, solver=solver, num_iters=num_iters, eps=eps,
                precision=precision,
            )
        if k > 0:
            x_ng = jax.lax.stop_gradient(x_in)
            # Run the truncated prefix on the stopped copy, then re-enter the
            # differentiable tail.  _solve_field is a fixed unrolled loop, so
            # split it: prefix iterations with x_ng, tail with x_in.
            u, v = _field_iterates(x_ng, u0b, v0p, mask, patch=patch,
                                   solver=solver, num_iters=k, eps=eps,
                                   precision=precision)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            return _field_tail(x_in, u, v, mask, solver=solver,
                               num_iters=num_iters - k, eps=eps,
                               precision=precision)
        return _solve_field(
            x_in, u0b, v0p, mask,
            patch=patch, solver=solver, num_iters=num_iters, eps=eps,
            precision=precision,
        )

    _, vjp = jax.vjp(f, x)
    (dx,) = vjp(g)
    dx_ref[0] = dx.reshape(p, p, s3p, cp).astype(dx_ref.dtype)


def _field_iterates(x4, u0b, v0p, mask, *, patch, solver, num_iters, eps,
                    precision=jax.lax.Precision.HIGHEST):
    """Like :func:`_solve_field` but returns the factors, not ``u v^T``."""
    p = patch
    pp, g3, _, c = x4.shape
    u = jnp.broadcast_to(u0b, (g3, c))
    v = jnp.broadcast_to(v0p[:, None, :, None], (pp, g3, p, c))
    return _field_tail_factors(x4, u, v, mask, solver=solver,
                               num_iters=num_iters, eps=eps, precision=precision)


def _field_tail_factors(x4, u, v, mask, *, solver, num_iters, eps,
                        precision=jax.lax.Precision.HIGHEST):
    relu = jax.nn.relu

    def head_sum(t):
        # HIGHEST keeps the MXU inputs at f32 for float32 inputs (default
        # precision truncates operands to bf16, breaking the solver's f32
        # parity contract).  For bfloat16 activations the caller passes
        # DEFAULT: the operands carry bf16 information anyway and
        # accumulation stays f32, so nothing is lost and the matmul runs 6x
        # fewer MXU passes.
        return jax.lax.dot_general(
            t, mask, (((t.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    for _ in range(num_iters):
        a_u = jnp.sum(x4 * v, axis=(0, 2))
        b_u = jnp.sum(v * v, axis=(0, 2))
        if solver == "hals":
            u = relu((a_u + eps) / (b_u + eps))
        else:
            u = (u * a_u + eps) / (u * b_u + eps)
        ub = u[None, :, None, :]
        a_v = head_sum(x4 * ub)
        b_v = head_sum(u * u)[None, :, None, :]
        if solver == "hals":
            v = relu((a_v + eps) / (b_v + eps))
        else:
            v = (v * a_v + eps) / (v * b_v + eps)
    return u, v


def _field_tail(x4, u, v, mask, *, solver, num_iters, eps,
                precision=jax.lax.Precision.HIGHEST):
    u, v = _field_tail_factors(x4, u, v, mask, solver=solver, num_iters=num_iters,
                               eps=eps, precision=precision)
    return u[None, :, None, :] * v


def _roll_packed3(t: Array, sh: int, pack: int) -> Array:
    """Cyclic natural-dim-3 roll applied in the lane-packed view (in-kernel).

    ``t`` is a packed block ``(..., chunk, pack*C)`` where lane group ``k``
    holds natural dim-3 rows ``[k*chunk, (k+1)*chunk)`` (see ``_pack_lanes``).
    Returns the packed image of ``jnp.roll`` by ``sh`` along the natural
    dim-3 axis: ``out[..., g, k*C+c] = nat[..., (k*chunk + g - sh) % S3, c]``.
    A sublane roll covers the within-chunk part; positions that cross a chunk
    boundary additionally take the neighbouring lane group, one lane roll of
    ``C`` away — the same trick as depthwise_packed's tap shifts.
    """
    chunk, cp = t.shape[-2], t.shape[-1]
    c = cp // pack
    sh = sh % (chunk * pack)
    if sh == 0:
        return t
    q, m = divmod(sh, chunk)
    a = pltpu.roll(t, shift=m, axis=t.ndim - 2) if m else t
    lo_sh, hi_sh = (q * c) % cp, ((q + 1) * c) % cp
    lo = pltpu.roll(a, shift=lo_sh, axis=t.ndim - 1) if lo_sh else a
    if m == 0:
        return lo
    hi = pltpu.roll(a, shift=hi_sh, axis=t.ndim - 1) if hi_sh else a
    g = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 2)
    return jnp.where(g >= m, lo, hi)


def _shift_kernel(x_ref, u0b_ref, v0p_ref, mask_ref, y_ref, *, patch: int,
                  shift3: int, solver: str, num_iters: int, eps: float,
                  precision=jax.lax.Precision.HIGHEST, pack: int = 1):
    """Forward solve on a pre-shifted (via Element offsets) row of windows.

    The block was loaded — already lane-packed, so every DMA runs at full
    128-lane width (a natural C<128 minor dim would force Mosaic's 4x-padded
    T(8,128) operand layout) — from the wrap-padded volume at element offset
    ``i*p + p - s`` in dims 1/2, so only the cyclic dim-3 shift remains; it
    is applied on-chip in the packed view (``_roll_packed3``) so ``jnp.roll``
    never materializes in HBM.  The dim-3 roll is also UNDONE on-chip before
    the write (the full S3 extent lives in-block, so the inverse roll is a
    couple of VPU passes over VMEM), leaving only the dims-1/2 roll-back to
    the caller — that one genuinely crosses block rows and stays in XLA,
    fused into the shift-averaging add.  Removing the XLA-side packed dim-3
    roll (two full-volume slice/select passes per shift) measured
    244.6 -> ~237 ms on the flagship train step (round 4).
    """
    p = patch
    _, _, _, s3p, cp = x_ref.shape
    x = _roll_packed3(x_ref[0].astype(jnp.float32), shift3, pack)
    y = _solve_field(
        x.reshape(p * p, s3p // p, p, cp),
        u0b_ref[...].astype(jnp.float32), v0p_ref[...].astype(jnp.float32),
        mask_ref[...].astype(jnp.float32),
        patch=patch, solver=solver, num_iters=num_iters, eps=eps,
        precision=precision,
    ).reshape(p, p, s3p, cp)
    # Output stays lane-packed; dim-3 coordinates are already unrolled.
    y_ref[0] = _roll_packed3(y, -shift3, pack).astype(y_ref.dtype)


def _shift_bwd_kernel(x_ref, g_ref, u0b_ref, v0p_ref, mask_ref, dx_ref, *, patch: int,
                      shift3: int, solver: str, num_iters: int,
                      num_grad_steps, eps: float,
                      precision=jax.lax.Precision.HIGHEST, pack: int = 1):
    """VJP of the shifted block-local solve, entirely in VMEM.

    Both operands arrive lane-packed (full-lane DMA, see ``_shift_kernel``).
    """
    p = patch
    _, _, _, s3p, cp = x_ref.shape
    g3 = s3p // p
    x = _roll_packed3(x_ref[0].astype(jnp.float32), shift3, pack)
    g = _roll_packed3(g_ref[0].astype(jnp.float32), shift3, pack)
    u0b = u0b_ref[...].astype(jnp.float32)
    v0p = v0p_ref[...].astype(jnp.float32)
    mask = mask_ref[...].astype(jnp.float32)

    num_grad = num_iters if num_grad_steps is None else num_grad_steps
    k = num_iters - num_grad

    def f(x_in):
        x4 = x_in.reshape(p * p, g3, p, cp)
        if k >= num_iters:
            x4 = jax.lax.stop_gradient(x4)
            y = _solve_field(x4, u0b, v0p, mask, patch=patch, solver=solver,
                             num_iters=num_iters, eps=eps, precision=precision)
        elif k > 0:
            u, v = _field_iterates(jax.lax.stop_gradient(x4), u0b, v0p, mask,
                                   patch=patch, solver=solver, num_iters=k,
                                   eps=eps, precision=precision)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            y = _field_tail(x4, u, v, mask, solver=solver,
                            num_iters=num_iters - k, eps=eps,
                            precision=precision)
        else:
            y = _solve_field(x4, u0b, v0p, mask, patch=patch, solver=solver,
                             num_iters=num_iters, eps=eps, precision=precision)
        return y.reshape(p, p, s3p, cp)

    _, vjp = jax.vjp(f, x)
    (dx,) = vjp(g)
    # Undo the dim-3 shift on-chip (see _shift_kernel); dims 1/2 roll back
    # in XLA.
    dx = _roll_packed3(dx.reshape(p, p, s3p, cp), -shift3, pack)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pad12(x: Array, p: int) -> Array:
    """Wrap-pad dims 1 and 2 by ``p`` at the front: ``xp[k] = x[(k - p) % S]``."""
    x = jnp.concatenate([x[:, -p:], x], axis=1)
    return jnp.concatenate([x[:, :, -p:], x], axis=2)


def _shifted_specs(patch: int, s1: int, s2: int, s3: int, c: int,
                   shift: tuple[int, int, int], pack: int = 1):
    """Specs for one shifted pass: Element-indexed reads from the padded,
    lane-packed volume (minor dim ``pack*C`` so DMA runs full-lane)."""
    p = patch
    cp = c * pack
    sh1, sh2, _ = shift
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(p), pl.Element(p), pl.Element(s3 // pack),
         pl.Element(cp)),
        lambda b, i, j: (b, i * p + p - sh1, j * p + p - sh2, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, p, p, s3 // pack, cp), lambda b, i, j: (b, i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    const_specs = [
        pl.BlockSpec((1, cp), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p * p, p), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cp, cp), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    return in_spec, out_spec, const_specs


def _norm_shift(shift, patch: int) -> tuple[int, int, int]:
    if shift is None:
        return (0, 0, 0)
    if isinstance(shift, int):
        shift = (shift, shift, shift)
    s = tuple(int(v) % patch for v in shift)
    if len(s) != 3:
        raise ValueError(f"shift must be a 3-tuple, got {shift!r}")
    return s


@functools.lru_cache(maxsize=None)
def _shift_pass_fn(patch: int, sh: tuple[int, int, int], solver: str,
                   num_iters: int, eps: float, precision, partitioned: bool,
                   pack: int = 1):
    """One shifted forward pass ``(xp, u0b, v0p, mask) -> y`` for this config.

    ``xp`` is the wrap-padded volume already lane-packed by ``_pack_lanes``
    (shape ``(B, S1+p, S2+p, S3/pack, pack*C)``).

    ``partitioned=True`` wraps it with a custom_partitioning rule so GSPMD
    shards along the batch dim (every other dim must be replicated: blocks
    read across window rows via element offsets and span full S3).
    """
    p = patch

    def local(xp, u0b, v0p, mask):
        B, s1p, s2p, s3p, cp = xp.shape
        s1, s2 = s1p - p, s2p - p
        s3, c = s3p * pack, cp // pack
        in_spec, out_spec, const_specs = _shifted_specs(p, s1, s2, s3, c, sh, pack)
        return pl.pallas_call(
            functools.partial(
                _shift_kernel, patch=p, shift3=sh[2], solver=solver,
                num_iters=num_iters, eps=eps, precision=precision, pack=pack,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B, s1, s2, s3 // pack, c * pack), xp.dtype
            ),
            grid=(B, s1 // p, s2 // p),
            in_specs=[in_spec, *const_specs],
            out_specs=out_spec,
            interpret=not _on_tpu(),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
            cost_estimate=pl.CostEstimate(
                flops=10 * num_iters * xp.size,
                bytes_accessed=2 * xp.dtype.itemsize * xp.size,
                transcendentals=0,
            ),
        )(xp, u0b, v0p, mask)

    if not partitioned:
        return local
    from .partitioning import make_batched_partitioned

    return make_batched_partitioned(
        local, n_batch_dims=1, n_operands=4, operand_ranks=(5, 2, 2, 2)
    )


def _multi_forward_impl(x, u0, v0, head_dim, patch, shifts, solver, num_iters, eps):
    from .partitioning import multi_device

    p = patch
    c = x.shape[-1]
    pack = _pick_pack(c, x.shape[3] // p, x.shape[3])
    u0b, v0p, mask = _prep_inputs(u0, v0, p, head_dim, c, pack)
    # Pack lanes ONCE in XLA, BEFORE the wrap pad: kernel operand blocks
    # then carry a full-128-lane minor dim (avoiding Mosaic's 4x-padded
    # T(8,128) DMA for natural C<128 blocks), and the pack transpose sits
    # adjacent to the producing dot where layout assignment absorbs it.
    xp = _pad12(_pack_lanes_xla(x, pack), p)
    part = multi_device()

    acc = None
    for shift in shifts:
        sh = _norm_shift(shift, p)
        fn = _shift_pass_fn(p, sh, solver, num_iters, float(eps),
                            _pick_precision(x.dtype), part, pack)
        ys = fn(xp, u0b, v0p, mask)
        # Undo the dims-1/2 shift (the kernel already unrolled dim 3
        # on-chip) WITHOUT leaving the packed layout; the boundary unpack
        # relayout then happens once, after the average.
        if sh[0] or sh[1]:
            ys = jnp.roll(ys, (-sh[0], -sh[1]), (1, 2))
        acc = ys if acc is None else acc + ys
    return _unpack_lanes_xla(acc, pack, c) / len(shifts)


@functools.lru_cache(maxsize=None)
def _shift_bwd_pass_fn(patch: int, sh: tuple[int, int, int], solver: str,
                       num_iters: int, num_grad_steps, eps: float, precision,
                       partitioned: bool, pack: int = 1):
    """One shifted VJP pass ``(xp, gp, u0b, v0p, mask) -> dx`` for this config."""
    p = patch

    def local(xp, gp, u0b, v0p, mask):
        B, s1p, s2p, s3p, cp = xp.shape
        s1, s2 = s1p - p, s2p - p
        s3, c = s3p * pack, cp // pack
        in_spec, out_spec, const_specs = _shifted_specs(p, s1, s2, s3, c, sh, pack)
        return pl.pallas_call(
            functools.partial(
                _shift_bwd_kernel, patch=p, shift3=sh[2], solver=solver,
                num_iters=num_iters, num_grad_steps=num_grad_steps, eps=eps,
                precision=precision, pack=pack,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B, s1, s2, s3 // pack, c * pack), xp.dtype
            ),
            grid=(B, s1 // p, s2 // p),
            in_specs=[in_spec, in_spec, *const_specs],
            out_specs=out_spec,
            interpret=not _on_tpu(),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            cost_estimate=pl.CostEstimate(
                flops=30 * num_iters * xp.size,
                bytes_accessed=3 * xp.dtype.itemsize * xp.size,
                transcendentals=0,
            ),
        )(xp, gp, u0b, v0p, mask)

    if not partitioned:
        return local
    from .partitioning import make_batched_partitioned

    # xp and gp share the batch sharding; the small factors are replicated.
    return make_batched_partitioned(
        local, n_batch_dims=1, n_operands=5, operand_ranks=(5, 5, 2, 2, 2),
        n_batched_operands=2,
    )


def _multi_backward_impl(x, g, u0, v0, head_dim, patch, shifts, solver, num_iters,
                         num_grad_steps, eps):
    from .partitioning import multi_device

    p = patch
    c = x.shape[-1]
    pack = _pick_pack(c, x.shape[3] // p, x.shape[3])
    u0b, v0p, mask = _prep_inputs(u0, v0, p, head_dim, c, pack)
    scale = 1.0 / len(shifts)
    xp = _pad12(_pack_lanes_xla(x, pack), p)
    # The cotangent seen by each shift's solve is g rolled forward (the
    # adjoint of the output's inverse roll), handled by the same padded
    # Element-offset loads as the input.
    gp = _pad12(_pack_lanes_xla(g, pack), p)
    part = multi_device()

    dacc = None
    for shift in shifts:
        sh = _norm_shift(shift, p)
        fn = _shift_bwd_pass_fn(p, sh, solver, num_iters, num_grad_steps,
                                float(eps), _pick_precision(x.dtype), part, pack)
        dxs = fn(xp, gp, u0b, v0p, mask)
        if sh[0] or sh[1]:
            dxs = jnp.roll(dxs, (-sh[0], -sh[1]), (1, 2))
        dacc = dxs if dacc is None else dacc + dxs
    return _unpack_lanes_xla(dacc, pack, c) * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def windowed_nmf_multi(
    x: Array,
    u0: Array,
    v0: Array,
    head_dim: int,
    patch: int,
    shifts: tuple = (None,),
    solver: str = "hals",
    num_iters: int = 5,
    eps: float = EPS,
    num_grad_steps=None,
) -> Array:
    """Shifted-window fused NMF mixing: mean over shifts of
    ``roll^-1(unfold(solve(fold(roll(x)))))`` in one padded pass per shift.

    Matches SWMatricize fold -> NMF -> averaged exact inverse
    (reference: operations.py:358-434 + matrix_factorization.py:544) without
    ever materializing the matricized tensor or the rolled copies.

    Args:
        x: ``(B, S1, S2, S3, C)`` channels-last volume (activation applied).
        shifts: sequence of ``None``/int/3-tuple cyclic shifts.
    """
    return _multi_forward_impl(x, u0, v0, head_dim, patch, shifts, solver, num_iters, eps)


def _multi_fwd(x, u0, v0, head_dim, patch, shifts, solver, num_iters, eps, num_grad_steps):
    y = _multi_forward_impl(x, u0, v0, head_dim, patch, shifts, solver, num_iters, eps)
    return y, (x, u0, v0)


def _multi_bwd(head_dim, patch, shifts, solver, num_iters, eps, num_grad_steps, res, g):
    x, u0, v0 = res
    dx = _multi_backward_impl(
        x, g, u0, v0, head_dim, patch, shifts, solver, num_iters, num_grad_steps, eps
    )
    return dx, jnp.zeros_like(u0), jnp.zeros_like(v0)


windowed_nmf_multi.defvjp(_multi_fwd, _multi_bwd)


def _prep_inputs(u0: Array, v0: Array, patch: int, head_dim: int, c: int,
                 pack: int = 1):
    """Trace-time constant kernel inputs: tiled u0, patch v0, head mask.

    With lane packing the kernel sees ``pack*C`` channels per row, so u0 is
    tiled across ``pack*h`` head slots and the block-diagonal mask covers
    ``(pack*C, pack*C)`` — packed windows never mix.
    """
    h = c // head_dim
    u0b = jnp.tile(u0[:, 0].astype(jnp.float32), h * pack)[None]  # (1, pack*C)
    v0p = v0[:, 0].astype(jnp.float32).reshape(patch * patch, patch)  # (p^2, p)
    mask = jnp.asarray(
        np.kron(
            np.eye(h * pack, dtype=np.float32),
            np.ones((head_dim, head_dim), np.float32),
        )
    )
    return u0b, v0p, mask


def _row_specs(patch: int, s3: int, c: int, pack: int = 1):
    """Block specs for the (1, p, p, S3, C) row-of-windows blocking.

    The output is lane-packed: (1, p, p, S3/pack, pack*C) blocks.
    """
    cp = c * pack
    in_spec = pl.BlockSpec(
        (1, patch, patch, s3, c),
        lambda b, i, j: (b, i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, patch, patch, s3 // pack, cp),
        lambda b, i, j: (b, i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    const_specs = [
        pl.BlockSpec((1, cp), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (patch * patch, patch), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((cp, cp), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    return in_spec, out_spec, const_specs




def _pick_precision(dtype) -> jax.lax.Precision:
    """f32 inputs get f32-faithful MXU passes; bf16 inputs already carry only
    bf16 information on the x side, so DEFAULT (bf16 operands, f32
    accumulation) is both exact-enough and 6x cheaper."""
    return (
        jax.lax.Precision.DEFAULT
        if dtype in (jnp.bfloat16, jnp.float16)
        else jax.lax.Precision.HIGHEST
    )

def _on_tpu() -> bool:
    return any(d.platform == "tpu" for d in jax.devices())


def _forward_impl(x, u0, v0, head_dim, patch, solver, num_iters, eps):
    B, s1, s2, s3, c = x.shape
    g1, g2 = s1 // patch, s2 // patch
    pack = _pick_pack(c, s3 // patch, s3)
    u0b, v0p, mask = _prep_inputs(u0, v0, patch, head_dim, c, pack)
    in_spec, out_spec, const_specs = _row_specs(patch, s3, c, pack)

    yp = pl.pallas_call(
        functools.partial(
            _kernel, patch=patch, solver=solver, num_iters=num_iters, eps=eps,
            precision=_pick_precision(x.dtype), pack=pack,
        ),
        out_shape=jax.ShapeDtypeStruct((B, s1, s2, s3 // pack, c * pack), x.dtype),
        grid=(B, g1, g2),
        in_specs=[in_spec, *const_specs],
        out_specs=out_spec,
        interpret=not _on_tpu(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=10 * num_iters * x.size,
            bytes_accessed=2 * x.dtype.itemsize * x.size,
            transcendentals=0,
        ),
    )(x, u0b, v0p, mask)
    return _unpack_lanes_xla(yp, pack, c)


def _backward_impl(x, g, u0, v0, head_dim, patch, solver, num_iters, num_grad_steps, eps):
    B, s1, s2, s3, c = x.shape
    g1, g2 = s1 // patch, s2 // patch
    pack = _pick_pack(c, s3 // patch, s3)
    u0b, v0p, mask = _prep_inputs(u0, v0, patch, head_dim, c, pack)
    in_spec, out_spec, const_specs = _row_specs(patch, s3, c, pack)

    dxp = pl.pallas_call(
        functools.partial(
            _bwd_kernel, patch=patch, solver=solver, num_iters=num_iters,
            num_grad_steps=num_grad_steps, eps=eps,
            precision=_pick_precision(x.dtype), pack=pack,
        ),
        out_shape=jax.ShapeDtypeStruct((B, s1, s2, s3 // pack, c * pack), x.dtype),
        grid=(B, g1, g2),
        in_specs=[in_spec, in_spec, *const_specs],
        out_specs=out_spec,
        interpret=not _on_tpu(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=30 * num_iters * x.size,
            bytes_accessed=3 * x.dtype.itemsize * x.size,
            transcendentals=0,
        ),
    )(x, g, u0b, v0p, mask)
    return _unpack_lanes_xla(dxp, pack, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def windowed_nmf_reconstruct(
    x: Array,
    u0: Array,
    v0: Array,
    head_dim: int,
    patch: int,
    solver: str = "hals",
    num_iters: int = 5,
    eps: float = EPS,
    num_grad_steps=None,
) -> Array:
    """Fused fold -> rank-1 NMF -> unfold on a channels-last 3-D volume.

    Args:
        x: ``(B, S1, S2, S3, C)`` volume (activation already applied).
        u0/v0: shared initial factors ``(head_dim, 1)`` / ``(patch^3, 1)``.

    Returns:
        Volume of the same shape: ``unfold(U V^T)`` per window/head.
    """
    return _forward_impl(x, u0, v0, head_dim, patch, solver, num_iters, eps)


def _fwd(x, u0, v0, head_dim, patch, solver, num_iters, eps, num_grad_steps):
    return _forward_impl(x, u0, v0, head_dim, patch, solver, num_iters, eps), (x, u0, v0)


def _bwd(head_dim, patch, solver, num_iters, eps, num_grad_steps, res, g):
    x, u0, v0 = res
    dx = _backward_impl(
        x, g, u0, v0, head_dim, patch, solver, num_iters, num_grad_steps, eps
    )
    return dx, jnp.zeros_like(u0), jnp.zeros_like(v0)


windowed_nmf_reconstruct.defvjp(_fwd, _bwd)
