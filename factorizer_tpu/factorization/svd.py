"""Truncated randomized SVD layer.

TPU-native counterpart of the reference SVD layer
(reference: factorizer/factorization/matrix_factorization.py:386-451), which
wraps ``torch.svd_lowrank`` reseeded with 42 on every call.  Here we implement
the same randomized subspace-iteration algorithm (Halko et al.) in pure jnp
with a fixed PRNG key, so every call is deterministic, batched, and
differentiable; the small QR/SVD factorizations run batched on-device.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.math import relative_error

__all__ = ["SVD", "infer_rank", "randomized_svd"]


def infer_rank(
    size: Sequence[int], rank: Optional[int], compression: Optional[float]
) -> tuple[int, float]:
    """The reference auto-rank rule: ``rank = ceil(M*N / (compression*(M+N)))``.

    Returns the resolved ``(rank, achieved_compression)``
    (reference: matrix_factorization.py:407-419,483-494).
    """
    M, N = size
    if (rank, compression) == (None, None):
        raise ValueError("'rank' or 'compression' must be specified.")
    df_input = M * N
    df_lowrank = M + N
    if rank is None:
        rank = max(math.ceil(df_input / (compression * df_lowrank)), 1)
    return rank, df_input / (rank * df_lowrank)


def randomized_svd(
    x: Array, rank: int, niter: int = 2, seed: int = 42
) -> tuple[Array, Array, Array]:
    """Batched randomized truncated SVD via subspace iteration.

    Args:
        x: array of shape ``(..., M, N)``.
        rank: number of singular triplets.
        niter: power iterations (2, matching ``torch.svd_lowrank``'s default).
        seed: PRNG seed; fixed per call for determinism.

    Returns:
        ``(u, s, v)`` with ``u: (..., M, R)``, ``s: (..., R)``, ``v: (..., N, R)``.
    """
    *batch, M, N = x.shape
    key = jax.random.key(seed)
    omega = jax.random.normal(key, (*batch, N, rank), dtype=x.dtype)

    def orth(y: Array) -> Array:
        q, _ = jnp.linalg.qr(y)
        return q

    q = orth(x @ omega)
    for _ in range(niter):
        q = orth(jnp.swapaxes(x, -1, -2) @ q)
        q = orth(x @ q)

    b = jnp.swapaxes(q, -1, -2) @ x  # (..., R, N)
    u_b, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ u_b
    v = jnp.swapaxes(vt, -1, -2)
    return u, s, v


class SVD:
    """Truncated randomized SVD layer (stateless, usable inside jitted code).

    Args:
        size: ``(M, N)`` matrix size.
        rank: target rank; inferred from ``compression`` if None.
        compression: target compression ratio used by the auto-rank rule.
        no_grad: stop gradients through the decomposition.
        niter: power iterations for the randomized algorithm.
        seed: PRNG seed used on every call (the reference reseeds with 42).
    """

    def __init__(
        self,
        size: Sequence[int],
        rank: Optional[int] = None,
        compression: float = 10,
        no_grad: bool = False,
        niter: int = 2,
        seed: int = 42,
        verbose: bool = False,
    ) -> None:
        self.size = tuple(size)
        self.no_grad = no_grad
        self.niter = niter
        self.seed = seed
        self.rank, self.compression = infer_rank(self.size, rank, compression)
        self.verbose = verbose

    def decompose(self, x: Array) -> tuple[Array, Array, Array]:
        u, s, v = randomized_svd(x, self.rank, niter=self.niter, seed=self.seed)
        if self.no_grad:
            u, s, v = jax.lax.stop_gradient((u, s, v))
        return u, s, v

    def reconstruct(self, u: Array, s: Array, v: Array) -> Array:
        return jnp.einsum("...ir,...r,...jr->...ij", u, s, v)

    def loss(self, x: Array, u: Array, s: Array, v: Array) -> Array:
        return relative_error(x, self.reconstruct(u, s, v))

    def __call__(self, x: Array) -> Array:
        return self.reconstruct(*self.decompose(x))

    forward = __call__
