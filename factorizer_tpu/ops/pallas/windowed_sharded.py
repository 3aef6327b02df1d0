"""Spatially-sharded windowed NMF mixing: fused kernel + explicit halo exchange.

The GSPMD path (ops/pallas/partitioning.py) keeps the fused kernel local for
batch-sharded meshes; for a volume sharded along its FIRST spatial axis
(sequence/window parallelism over huge volumes) GSPMD would have to reshard.
This module provides the shard_map formulation instead: each device runs the
same per-shift Pallas passes on its local rows, and the only communication
is a ``ppermute`` of the p-row halo (the wrap-pad of the cyclic shift) plus
a ppermute routing s rows of output/cotangent to their owner — O(p/S1_local)
of the volume over ICI per shift, no resharding.

Semantics are identical to :func:`windowed_nmf_multi` on the gathered
volume (tested shard==single-device on the virtual mesh).  Requires the
local row count to be a multiple of the patch size.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

from .windowed_nmf_kernel import (
    EPS,
    _norm_shift,
    _pick_pack,
    _pack_lanes_xla,
    _pick_precision,
    _prep_inputs,
    _shift_bwd_pass_fn,
    _shift_pass_fn,
    _unpack_lanes_xla,
)

__all__ = ["windowed_nmf_multi_spatial"]


def _ring(axis_name: str, forward: bool):
    n = jax.lax.axis_size(axis_name)
    if forward:
        return [(i, (i + 1) % n) for i in range(n)]
    return [(i, (i - 1) % n) for i in range(n)]


def _pad12_halo(x: Array, p: int, axis_name: str) -> Array:
    """Local wrap-pad: dim-1 front pad comes from the left neighbor's tail
    (cyclic over the sharded axis); dim 2 is fully local."""
    halo = jax.lax.ppermute(x[:, -p:], axis_name, _ring(axis_name, forward=True))
    x = jnp.concatenate([halo, x], axis=1)
    return jnp.concatenate([x[:, :, -p:], x], axis=2)


def _roll_back_dim1(y: Array, s: int, axis_name: str) -> Array:
    """Global ``jnp.roll(y, -s, axis=1)`` on a dim-1-sharded array: each
    shard's trailing s rows arrive from the right neighbor's head."""
    if s == 0:
        return y
    head = jax.lax.ppermute(y[:, :s], axis_name, _ring(axis_name, forward=False))
    return jnp.concatenate([y[:, s:], head], axis=1)


def _local_forward(x, u0, v0, head_dim, patch, shifts, solver, num_iters, eps,
                   axis_name):
    p = patch
    c = x.shape[-1]
    pack = _pick_pack(c, x.shape[3] // p, x.shape[3])
    u0b, v0p, mask = _prep_inputs(u0, v0, p, head_dim, c, pack)
    xp = _pad12_halo(_pack_lanes_xla(x, pack), p, axis_name)

    acc = None
    for shift in shifts:
        sh = _norm_shift(shift, p)
        fn = _shift_pass_fn(p, sh, solver, num_iters, float(eps),
                            _pick_precision(x.dtype), False, pack)
        # Accumulate in the packed layout (the kernel already unrolled
        # dim 3 on-chip) and unpack once after the average; the dim-1 halo
        # roll-back moves whole packed rows.
        ys = fn(xp, u0b, v0p, mask)
        if sh[1]:
            ys = jnp.roll(ys, -sh[1], axis=2)
        ys = _roll_back_dim1(ys, sh[0], axis_name)
        acc = ys if acc is None else acc + ys
    return _unpack_lanes_xla(acc, pack, c) / len(shifts)


def _local_backward(x, g, u0, v0, head_dim, patch, shifts, solver, num_iters,
                    num_grad_steps, eps, axis_name):
    p = patch
    c = x.shape[-1]
    pack = _pick_pack(c, x.shape[3] // p, x.shape[3])
    u0b, v0p, mask = _prep_inputs(u0, v0, p, head_dim, c, pack)
    xp = _pad12_halo(_pack_lanes_xla(x, pack), p, axis_name)
    gp = _pad12_halo(_pack_lanes_xla(g, pack), p, axis_name)

    dacc = None
    for shift in shifts:
        sh = _norm_shift(shift, p)
        fn = _shift_bwd_pass_fn(p, sh, solver, num_iters, num_grad_steps,
                                float(eps), _pick_precision(x.dtype), False, pack)
        dxs = fn(xp, gp, u0b, v0p, mask)
        if sh[1]:
            dxs = jnp.roll(dxs, -sh[1], axis=2)
        dxs = _roll_back_dim1(dxs, sh[0], axis_name)
        dacc = dxs if dacc is None else dacc + dxs
    return _unpack_lanes_xla(dacc, pack, c) / len(shifts)


def windowed_nmf_multi_spatial(
    x: Array,
    u0: Array,
    v0: Array,
    head_dim: int,
    patch: int,
    shifts: tuple,
    solver: str = "hals",
    num_iters: int = 5,
    eps: float = EPS,
    num_grad_steps: Optional[int] = None,
    *,
    mesh: Mesh,
    axis_name: str = "model",
) -> Array:
    """Shifted-window fused NMF mixing for a dim-1-spatially-sharded volume.

    Args:
        x: ``(B, S1, S2, S3, C)`` volume sharded ``P(None, axis_name)``.
        mesh/axis_name: the mesh and the axis S1 is sharded over.  Each
            shard's row count must be a multiple of ``patch``.

    Returns:
        The mixed volume with the same sharding.
    """
    spec = P(None, axis_name)

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def op(x, u0, v0):
        return jax.shard_map(
            functools.partial(
                _local_forward, head_dim=head_dim, patch=patch, shifts=shifts,
                solver=solver, num_iters=num_iters, eps=eps, axis_name=axis_name,
            ),
            mesh=mesh, in_specs=(spec, P(), P()), out_specs=spec,
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )(x, u0, v0)

    def op_fwd(x, u0, v0):
        return op(x, u0, v0), (x, u0, v0)

    def op_bwd(res, g):
        x, u0, v0 = res
        dx = jax.shard_map(
            functools.partial(
                _local_backward, head_dim=head_dim, patch=patch, shifts=shifts,
                solver=solver, num_iters=num_iters,
                num_grad_steps=num_grad_steps, eps=eps, axis_name=axis_name,
            ),
            mesh=mesh, in_specs=(spec, spec, P(), P()), out_specs=spec,
            check_vma=False,
        )(x, g, u0, v0)
        return dx, jnp.zeros_like(u0), jnp.zeros_like(v0)

    op.defvjp(op_fwd, op_bwd)
    return op(x, u0, v0)
