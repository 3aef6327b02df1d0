"""Fused windowed-NMF Pallas kernel: fold -> solve -> unfold in one pass.

The Factorizer mixer's data path is ``matricize (transpose) -> NMF ->
inverse matricize (transpose)``.  Under XLA each transpose materializes the
full matricized tensor in HBM, which dominates the mixer's runtime
(PERFORMANCE.md).  This kernel instead reads the volume in its native
channels-last layout one window-row at a time, performs the head/window
reshuffle inside VMEM, runs the iterated rank-1 solver on-chip, and writes
the reconstruction back — the fold/unfold never touches HBM.

Covers the flagship configuration: 3-D volumes, uniform cubic patch,
``head_dim`` channel split, rank-1 HALS/MU with shared random init
(reference semantics: factorizer.py:34-50 + matrix_factorization.py:514-546).
Shifted-window copies are handled by the caller with ``jnp.roll`` (elementwise
activation and roll commute with the fold, so only the volume is ever
materialized).  Backward is a ``custom_vjp`` that recomputes the
mathematically identical XLA fold->solve->unfold and differentiates it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nmf_kernel import _SOLVER_ITERS, _rank1_iter_vpu

__all__ = ["windowed_nmf_reconstruct", "xla_windowed_nmf_reconstruct", "supports_windowed"]

EPS = 1e-16


def supports_windowed(
    x_shape: tuple[int, ...], head_dim: int, patch: int, solver: str, rank: int
) -> bool:
    """Eligibility: 3-D channels-last volume, cubic patches, rank 1, hals/mu."""
    if len(x_shape) != 5 or rank != 1 or solver not in _SOLVER_ITERS:
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
    y = u @ jnp.swapaxes(v, -1, -2)
    return _unfold(y, x.shape, head_dim, patch).astype(x.dtype)


def _kernel(x_ref, u0_ref, v0_ref, y_ref, *, head_dim: int, patch: int,
            solver: str, num_iters: int, eps: float):
    # Block: (1, patch, patch, S3, C) — one row of windows along the last axis.
    x = x_ref[0].astype(jnp.float32)  # (p, p, S3, C)
    p = patch
    s3, c = x.shape[2], x.shape[3]
    g3, h = s3 // p, c // head_dim

    # In-VMEM fold: (p, p, g3, p, h, d) -> (g3*h, d, p^3)
    x6 = x.reshape(p, p, g3, p, h, head_dim)
    m = jnp.transpose(x6, (2, 4, 5, 0, 1, 3)).reshape(g3 * h, head_dim, p**3)

    u = jnp.broadcast_to(u0_ref[...][:, 0], (g3 * h, head_dim))
    v = jnp.broadcast_to(v0_ref[...][:, 0], (g3 * h, p**3))
    for _ in range(num_iters):  # statically unrolled; everything on-chip
        u, v = _rank1_iter_vpu(m, u, v, eps, solver)
    y = u[:, :, None] * v[:, None, :]  # (g3*h, d, p^3)

    # In-VMEM unfold back to the volume block layout.
    y6 = y.reshape(g3, h, head_dim, p, p, p)
    out = jnp.transpose(y6, (3, 4, 0, 5, 1, 2)).reshape(p, p, s3, c)
    y_ref[0] = out.astype(y_ref.dtype)


def _forward_impl(x, u0, v0, head_dim, patch, solver, num_iters, eps):
    B, s1, s2, s3, c = x.shape
    g1, g2 = s1 // patch, s2 // patch

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    return pl.pallas_call(
        functools.partial(
            _kernel, head_dim=head_dim, patch=patch, solver=solver,
            num_iters=num_iters, eps=eps,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B, g1, g2),
        in_specs=[
            pl.BlockSpec(
                (1, patch, patch, s3, c),
                lambda b, i, j: (b, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((head_dim, 1), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((patch**3, 1), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, patch, patch, s3, c),
            lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=not on_tpu,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=14 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * num_iters * x.size,
            bytes_accessed=2 * 4 * x.size,
            transcendentals=0,
        ),
    )(x, u0.astype(jnp.float32), v0.astype(jnp.float32))


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
    num_grad = num_iters if num_grad_steps is None else num_grad_steps
    k = num_iters - num_grad

    def recompute(x_in):
        x_ng = jax.lax.stop_gradient(x_in)
        it = _SOLVER_ITERS[solver]
        m_full = _fold(x_in, head_dim, patch).astype(jnp.float32)
        m_ng = jax.lax.stop_gradient(m_full)
        batch = m_full.shape[:-2]
        u = jnp.broadcast_to(u0, (*batch, *u0.shape)).astype(jnp.float32)
        v = jnp.broadcast_to(v0, (*batch, *v0.shape)).astype(jnp.float32)
        for i in range(1, num_iters + 1):
            u, v = it(m_ng if i <= k else m_full, u, v, eps)
        y = u @ jnp.swapaxes(v, -1, -2)
        return _unfold(y, x_in.shape, head_dim, patch).astype(x_in.dtype)

    _, vjp = jax.vjp(recompute, x)
    (dx,) = vjp(g)
    return dx, jnp.zeros_like(u0), jnp.zeros_like(v0)


windowed_nmf_reconstruct.defvjp(_fwd, _bwd)
