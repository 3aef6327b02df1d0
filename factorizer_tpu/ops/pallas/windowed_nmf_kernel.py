"""Fused windowed-NMF Pallas kernel: fold -> solve -> unfold in one pass.

The Factorizer mixer's data path is ``matricize (transpose) -> NMF ->
inverse matricize (transpose)``.  Under XLA each transpose materializes the
full matricized tensor in HBM, which dominates the mixer's runtime
(PERFORMANCE.md).  This kernel instead streams the volume through VMEM in
window rows and solves the rank-1 factorization *in the volume's own
layout* — the matricized tensor never exists.

Key trick (Mosaic supports no lane-splitting reshapes): the per-window
factor ``u`` lives channel-shaped ``(C,) = (heads*head_dim,)`` and ``v``
lives patch-shaped ``(p, p, p, C)`` broadcast across the ``head_dim``
channels of its head.  The only cross-channel coupling — per-head sums for
the Gram terms — is a multiply by a precomputed block-diagonal head mask
``M in {0,1}^{C x C}``, i.e. one tiny MXU matmul per update:

    a_u[c]        = sum_ijk x * v                  (elementwise + reduce)
    b_u[c]        = sum_ijk v * v                  (constant across a head)
    a_v[ijk, c]   = (x * u) @ M                    (head-sum, broadcast back)
    b_v[c]        = (u * u) @ M

which reproduces the reference HALS/MU updates exactly
(matrix_factorization.py:210-247 specialized to rank 1).  Shifted-window
copies are handled by the caller with ``jnp.roll`` (activation and roll
commute with the fold).  Backward is a ``custom_vjp`` recomputing the
mathematically identical XLA fold->solve->unfold.
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

__all__ = ["windowed_nmf_reconstruct", "xla_windowed_nmf_reconstruct", "supports_windowed"]

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
    y = u @ jnp.swapaxes(v, -1, -2)
    return _unfold(y, x.shape, head_dim, patch).astype(x.dtype)


def _kernel(x_ref, u0b_ref, v0b_ref, mask_ref, y_ref, *, patch: int,
            solver: str, num_iters: int, eps: float):
    # Block: (1, p, p, p, C) — exactly one window; grid covers (B, g1, g2, g3).
    p = patch
    c = x_ref.shape[4]
    mask = mask_ref[...].astype(jnp.float32)  # (C, C) block-diagonal head mask
    u0 = u0b_ref[...].astype(jnp.float32)  # (1, C): u0 tiled over heads
    v0 = v0b_ref[...].astype(jnp.float32)  # (p, p, p): shared patch factor
    relu = jax.nn.relu

    def head_sum(t: Array) -> Array:
        # (..., C) @ (C, C) mask: per-head sum broadcast back to each channel
        return jax.lax.dot_general(
            t, mask, (((t.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    xw = x_ref[0].astype(jnp.float32)  # (p, p, p, C)
    u = u0[0]  # (C,)
    v = jnp.broadcast_to(v0[..., None], (p, p, p, c))  # head-broadcast v

    for _ in range(num_iters):  # statically unrolled, all on-chip
        a_u = jnp.sum(xw * v, axis=(0, 1, 2))  # (C,)
        b_u = jnp.sum(v * v, axis=(0, 1, 2))  # (C,) — constant per head
        if solver == "hals":
            u = relu((a_u + eps) / (b_u + eps))
        else:  # mu
            u = (u * a_u + eps) / (u * b_u + eps)
        a_v = head_sum(xw * u)  # (p,p,p,C)
        b_v = head_sum((u * u)[None, :])[0]  # (C,)
        if solver == "hals":
            v = relu((a_v + eps) / (b_v + eps))
        else:
            v = (v * a_v + eps) / (v * b_v + eps)

    y_ref[0] = (u * v).astype(y_ref.dtype)


def _forward_impl(x, u0, v0, head_dim, patch, solver, num_iters, eps):
    B, s1, s2, s3, c = x.shape
    h = c // head_dim
    g1, g2, g3 = s1 // patch, s2 // patch, s3 // patch

    # Precomputed (trace-time constant) kernel inputs: tiled u0, patch-shaped
    # v0, and the block-diagonal head mask.
    u0b = jnp.tile(u0[:, 0].astype(jnp.float32), h)[None]  # (1, C)
    v0b = v0[:, 0].astype(jnp.float32).reshape(patch, patch, patch)
    mask = jnp.asarray(np.kron(np.eye(h, dtype=np.float32), np.ones((head_dim, head_dim), np.float32)))

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    return pl.pallas_call(
        functools.partial(
            _kernel, patch=patch, solver=solver, num_iters=num_iters, eps=eps
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B, g1, g2, g3),
        in_specs=[
            pl.BlockSpec(
                (1, patch, patch, patch, c),
                lambda b, i, j, k: (b, i, j, k, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c), lambda b, i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (patch, patch, patch), lambda b, i, j, k: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((c, c), lambda b, i, j, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, patch, patch, patch, c),
            lambda b, i, j, k: (b, i, j, k, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=not on_tpu,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=14 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * num_iters * x.size,
            bytes_accessed=2 * 4 * x.size,
            transcendentals=0,
        ),
    )(x, u0b, v0b, mask)


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
