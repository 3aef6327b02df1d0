"""Batched math primitives used by factorization solvers.

TPU-native reimplementation of the reference math ops
(reference: factorizer/factorization/operations.py:13-144).  All functions are
pure ``jnp`` and fuse under ``jax.jit``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from jax import Array

__all__ = ["dot", "norm2", "softmax", "relative_error", "kl_divergence"]

EPS = 1e-16


def dot(x: Array, y: Array) -> Array:
    """Batched Frobenius inner product over the last two axes.

    Args:
        x: array of shape ``(..., M, N)``.
        y: array broadcastable to ``x``.

    Returns:
        Array of shape ``(..., 1)`` with the dot products.
    """
    return jnp.sum(x * y, axis=(-2, -1))[..., None]


def norm2(x: Array, w: Optional[Array] = None) -> Array:
    """Batched (optionally weighted) L2 norm over all non-batch axes.

    Args:
        x: array of shape ``(B, ...)``.
        w: optional weights of the same shape.

    Returns:
        Vector of length ``B``.
    """
    y = jnp.square(x).reshape(x.shape[0], -1)
    if w is not None:
        y = y * w.reshape(w.shape[0], -1)
    return jnp.sqrt(jnp.sum(y, axis=1))


def softmax(x: Array, axis: int | Sequence[int]) -> Array:
    """Softmax jointly normalized over one or several axes.

    Unlike the reference's permute/flatten implementation
    (operations.py:54-96), this computes the joint softmax directly with a
    multi-axis reduction, which XLA fuses into a single pass.
    """
    axes = (axis,) if isinstance(axis, int) else tuple(axis)
    axes = tuple(a % x.ndim for a in axes)
    m = jnp.max(x, axis=axes, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axes, keepdims=True)


def relative_error(
    x: Array,
    y: Array,
    w: Optional[Array] = None,
    eps: float = EPS,
) -> Array:
    """Batched relative error ``|x - y| / |x|`` in the (weighted) L2 norm."""
    return (norm2(x - y, w) + eps) / (norm2(x, w) + eps)


def kl_divergence(x: Array, y: Array, eps: float = EPS) -> Array:
    """Batched generalized KL divergence ``sum(x log(x/y) - x + y)`` (mean over elements)."""
    x = jnp.clip(x, min=eps)
    y = jnp.clip(y, min=eps)
    kl = x * jnp.log(x / y) - x + y
    return jnp.mean(kl.reshape(kl.shape[0], -1), axis=-1)
