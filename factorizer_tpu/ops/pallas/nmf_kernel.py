"""Fused Pallas TPU kernel for iterated NMF solvers (HALS / MU, small rank).

The hot loop of the Factorizer forward (SURVEY.md §3.1) is ``num_iters``
iterations of two tiny batched matmuls + eps-regularized divides per matrix,
over a huge batch of small ``(M, N)`` matrices (e.g. 32k matrices of 8x512 at
128³).  Under plain XLA each iteration re-reads ``x`` from HBM; this kernel
tiles the batch, keeps each tile of ``x`` resident in VMEM for the whole
solve, and writes only the reconstruction — one HBM read + one write total,
~``2*num_iters``x less HBM traffic on the NMF stage.

Gradient support: the public entry :func:`nmf_reconstruct` wraps the kernel
in ``jax.custom_vjp`` whose backward recomputes the mathematically identical
pure-XLA solve and differentiates it (rematerialization), so training
gradients — including the reference's ``num_grad_steps`` truncation semantics
(matrix_factorization.py:506-512) — are exact.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nmf_reconstruct", "xla_nmf_reconstruct", "supports"]

EPS = 1e-16



def _mm(a: Array, b: Array) -> Array:
    """f32-faithful matmul (default precision truncates operands to bf16)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

def _hals_iter(x: Array, u: Array, v: Array, eps: float) -> tuple[Array, Array]:
    """One HALS iteration (rank handled by per-column loop; rank-1 fast path)."""
    R = u.shape[-1]
    relu = jax.nn.relu

    def update(x_, u_, v_):
        # x_: (..., M, N), u_: (..., M, R), v_: (..., N, R)
        a = jax.lax.dot_general(
            x_, v_, (((x_.ndim - 1,), (v_.ndim - 2,)), (tuple(range(x_.ndim - 2)),) * 2),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (..., M, R)
        b = jax.lax.dot_general(
            v_, v_, (((v_.ndim - 2,), (v_.ndim - 2,)), (tuple(range(v_.ndim - 2)),) * 2),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (..., R, R)
        if R == 1:
            return relu((a + eps) / (b + eps))
        cols = [u_[..., r : r + 1] for r in range(R)]
        for r in range(R):
            others = [j for j in range(R) if j != r]
            u_others = jnp.concatenate([cols[j] for j in others], axis=-1)
            # static slices (no gather: fancy indexing captures constant
            # index arrays, which Pallas kernels cannot close over)
            b_others = jnp.concatenate(
                [b[..., j : j + 1, r : r + 1] for j in others], axis=-2
            )
            num = a[..., r : r + 1] - _mm(u_others, b_others) + eps
            den = b[..., r : r + 1, r : r + 1] + eps
            cols[r] = relu(num / den)
        return jnp.concatenate(cols, axis=-1)

    u = update(x, u, v)
    v = update(jnp.swapaxes(x, -1, -2), v, u)
    return u, v


def _mu_iter(x: Array, u: Array, v: Array, eps: float) -> tuple[Array, Array]:
    """One Lee-Seung multiplicative update iteration."""

    def update(x_, u_, v_):
        a = jax.lax.dot_general(
            x_, v_, (((x_.ndim - 1,), (v_.ndim - 2,)), (tuple(range(x_.ndim - 2)),) * 2),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        b = jax.lax.dot_general(
            v_, v_, (((v_.ndim - 2,), (v_.ndim - 2,)), (tuple(range(v_.ndim - 2)),) * 2),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return (u_ * a + eps) / (_mm(u_, b) + eps)

    u = update(x, u, v)
    v = update(jnp.swapaxes(x, -1, -2), v, u)
    return u, v


_SOLVER_ITERS: dict[str, Callable] = {"hals": _hals_iter, "mu": _mu_iter}


def supports(solver: str, rank: int, size: tuple[int, int]) -> bool:
    """Whether the fused kernel covers this config."""
    return solver in _SOLVER_ITERS and 1 <= rank <= 4 and size[0] >= 1 and size[1] >= 1


def xla_nmf_reconstruct(
    x: Array, u0: Array, v0: Array, solver: str, num_iters: int, eps: float = EPS
) -> Array:
    """Pure-XLA reference path (also the VJP recompute path)."""
    it = _SOLVER_ITERS[solver]
    batch = x.shape[:-2]
    u = jnp.broadcast_to(u0, (*batch, *u0.shape)).astype(x.dtype)
    v = jnp.broadcast_to(v0, (*batch, *v0.shape)).astype(x.dtype)
    for _ in range(num_iters):
        u, v = it(x, u, v, eps)
    return _mm(u, jnp.swapaxes(v, -1, -2))


def _rank1_iter_vpu(x: Array, u: Array, v: Array, eps: float, solver: str) -> tuple[Array, Array]:
    """One rank-1 iteration as pure VPU ops: no transposes, no matmuls.

    x: (TB, M, N); u: (TB, M); v: (TB, N).  The contractions are
    elementwise-multiply + lane/sublane reductions, which Mosaic fuses
    without materializing transposed copies of the x tile.
    """
    relu = jax.nn.relu
    a_u = jnp.sum(x * v[:, None, :], axis=2)  # (TB, M)
    b_u = jnp.sum(v * v, axis=1)[:, None]  # (TB, 1)
    if solver == "hals":
        u = relu((a_u + eps) / (b_u + eps))
    else:  # mu
        u = (u * a_u + eps) / (u * b_u + eps)
    a_v = jnp.sum(x * u[:, :, None], axis=1)  # (TB, N)
    b_v = jnp.sum(u * u, axis=1)[:, None]
    if solver == "hals":
        v = relu((a_v + eps) / (b_v + eps))
    else:
        v = (v * a_v + eps) / (v * b_v + eps)
    return u, v


def _kernel(x_ref, u0_ref, v0_ref, y_ref, *, solver: str, num_iters: int, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (TB, M, N) resident in VMEM
    tb = x.shape[0]
    rank = u0_ref.shape[-1]
    if rank == 1:
        u = jnp.broadcast_to(u0_ref[...][:, 0], (tb, u0_ref.shape[0])).astype(jnp.float32)
        v = jnp.broadcast_to(v0_ref[...][:, 0], (tb, v0_ref.shape[0])).astype(jnp.float32)
        for _ in range(num_iters):  # statically unrolled; operands stay on-chip
            u, v = _rank1_iter_vpu(x, u, v, eps, solver)
        y_ref[...] = (u[:, :, None] * v[:, None, :]).astype(y_ref.dtype)
        return
    u = jnp.broadcast_to(u0_ref[...], (tb, *u0_ref.shape)).astype(jnp.float32)
    v = jnp.broadcast_to(v0_ref[...], (tb, *v0_ref.shape)).astype(jnp.float32)
    it = _SOLVER_ITERS[solver]
    for _ in range(num_iters):
        u, v = it(x, u, v, eps)
    y_ref[...] = _mm(u, jnp.swapaxes(v, -1, -2)).astype(y_ref.dtype)


def _pick_tile(n_mats: int, m: int, n: int, rank: int, vmem_budget: int = 6 * 2**20) -> int:
    # 6 MB measured fastest on v5e (sweep in PERFORMANCE.md); with double
    # buffering the in+out tiles stay inside the 14 MB scoped-vmem limit.
    """Largest power-of-two batch tile whose x + y tiles fit the VMEM budget."""
    bytes_per_mat = 4 * (2 * m * n + 2 * (m + n) * rank)
    tile = max(vmem_budget // max(bytes_per_mat, 1), 1)
    tile = 1 << (tile.bit_length() - 1)
    while tile > 1 and n_mats % tile and tile > n_mats:
        tile //= 2
    return max(min(tile, 256), 1)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def nmf_reconstruct(
    x: Array,
    u0: Array,
    v0: Array,
    solver: str = "hals",
    num_iters: int = 5,
    eps: float = EPS,
    num_grad_steps: Optional[int] = None,
) -> Array:
    """Fused ``decompose -> reconstruct`` for shared-buffer random init.

    Args:
        x: ``(..., M, N)`` batch of matrices.
        u0/v0: shared initial factors ``(M, R)`` / ``(N, R)``.
        solver: ``"hals"`` or ``"mu"``.
        num_iters: solver iterations (statically unrolled in-kernel).
        num_grad_steps: backward-pass truncation (forward value unaffected).

    Returns:
        ``u @ v^T`` of the same shape as ``x``.
    """
    return _dispatch_forward(x, u0, v0, solver, num_iters, eps)


def _forward_impl(x, u0, v0, solver, num_iters, eps):
    *batch, m, n = x.shape
    n_mats = 1
    for b in batch:
        n_mats *= b
    if n_mats == 0:
        return x
    rank = u0.shape[-1]
    xf = x.reshape(n_mats, m, n)

    tile = _pick_tile(n_mats, m, n, rank)
    pad = (-n_mats) % tile
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, m, n), xf.dtype)], axis=0)
    grid = (xf.shape[0] // tile,)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    y = pl.pallas_call(
        functools.partial(_kernel, solver=solver, num_iters=num_iters, eps=eps),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, rank), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, rank), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=not on_tpu,  # CPU tests run the same kernel interpreted
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=14 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * num_iters * xf.size * u0.shape[-1],
            bytes_accessed=2 * 4 * xf.size,
            transcendentals=0,
        ),
    )(xf, u0.astype(jnp.float32), v0.astype(jnp.float32))

    if pad:
        y = y[:n_mats]
    return y.reshape(*batch, m, n)


@functools.lru_cache(maxsize=None)
def _partitioned_forward(ndim: int, solver: str, num_iters: int, eps: float):
    """A GSPMD-partitionable wrapper of the forward kernel for this config.

    Shardable along every leading batch dim of x — after the matricize fold
    those are the (batch*heads) and window axes, so dp / window(sp) / head(tp)
    shardings all keep the fused kernel local per device.
    """
    from .partitioning import make_batched_partitioned

    def local(x, u0, v0):
        return _forward_impl(x, u0, v0, solver, num_iters, eps)

    return make_batched_partitioned(
        local, n_batch_dims=ndim - 2, n_operands=3, operand_ranks=(ndim, 2, 2)
    )


def _dispatch_forward(x, u0, v0, solver, num_iters, eps):
    from .partitioning import multi_device

    if multi_device():
        return _partitioned_forward(x.ndim, solver, num_iters, float(eps))(x, u0, v0)
    return _forward_impl(x, u0, v0, solver, num_iters, eps)


def _fwd(x, u0, v0, solver, num_iters, eps, num_grad_steps):
    y = _dispatch_forward(x, u0, v0, solver, num_iters, eps)
    return y, (x, u0, v0)


def _bwd(solver, num_iters, eps, num_grad_steps, residuals, g):
    x, u0, v0 = residuals
    num_grad = num_iters if num_grad_steps is None else num_grad_steps
    k = num_iters - num_grad

    def recompute(x_in):
        # Mirror MatrixFactorization.decompose's stop_gradient phases.
        x_ng = jax.lax.stop_gradient(x_in)
        it = _SOLVER_ITERS[solver]
        batch = x_in.shape[:-2]
        u = jnp.broadcast_to(u0, (*batch, *u0.shape)).astype(x_in.dtype)
        v = jnp.broadcast_to(v0, (*batch, *v0.shape)).astype(x_in.dtype)
        for i in range(1, num_iters + 1):
            u, v = it(x_ng if i <= k else x_in, u, v, eps)
        # match the kernel's output dtype (solver matmuls accumulate f32)
        return _mm(u, jnp.swapaxes(v, -1, -2)).astype(x_in.dtype)

    _, vjp = jax.vjp(recompute, x)
    (dx,) = vjp(g)
    return dx, jnp.zeros_like(u0), jnp.zeros_like(v0)


nmf_reconstruct.defvjp(_fwd, _bwd)
