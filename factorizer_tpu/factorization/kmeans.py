"""Differentiable (truncated-gradient) clustering layers.

TPU-native counterpart of the reference clustering layers
(reference: factorizer/factorization/kmeans.py:11-136).  Stateless pure-jnp
objects; the hard-assignment scatter becomes a ``one_hot(argmin)`` which XLA
fuses, and the seeded random center choice is computed at trace time (static
shapes), matching the reference's ``random.sample(seed)`` init.
"""

from __future__ import annotations

import math
import random
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["KMeans", "FuzzyCMeans", "EntropyKMeans"]


class KMeans:
    """Batched k-means with the num_grad_steps gradient-truncation pattern."""

    def __init__(
        self,
        num_centers: int,
        num_iters: int = 10,
        num_grad_steps: Optional[int] = None,
        eps: float = 1e-16,
        seed: int = 42,
        verbose: bool = False,
        *args: Any,
        **kwargs: Any,
    ) -> None:
        self.num_centers = num_centers
        self.num_iters = num_iters
        self.num_grad_steps = num_iters if num_grad_steps is None else num_grad_steps
        self.eps = eps
        self.seed = seed
        self.verbose = verbose

    @staticmethod
    def get_dist(x: Array, v: Array) -> Array:
        """Squared Euclidean distances between rows of x (..., M, N) and centers v (..., K, N)."""
        x2 = jnp.sum(x**2, axis=-1, keepdims=True)
        xv = x @ jnp.swapaxes(v, -1, -2)
        v2 = jnp.sum(v**2, axis=-1)[..., None, :]
        return jax.nn.relu(x2 - 2 * xv + v2)

    def get_clusters(self, x: Array, v: Array) -> Array:
        return jnp.argmin(self.get_dist(x, v), axis=-1)

    def update_u(self, x: Array, u: Optional[Array], v: Array) -> Array:
        """Hard membership matrix via one-hot of the nearest center."""
        clusters = self.get_clusters(x, v)
        return jax.nn.one_hot(clusters, self.num_centers, dtype=x.dtype)

    def update_v(self, x: Array, u: Array, v: Array) -> Array:
        """Membership-weighted centroid update (column-normalized u)."""
        u = (u + self.eps) / (jnp.sum(u, axis=-2, keepdims=True) + self.eps)
        return jnp.swapaxes(u, -1, -2) @ x

    def update(self, x: Array, u: Array, v: Array) -> tuple[Array, Array]:
        u = self.update_u(x, u, v)
        v = self.update_v(x, u, v)
        return u, v

    def initialize(self, x: Array) -> tuple[Array, Array]:
        rng = random.Random(self.seed)
        inds = rng.sample(range(x.shape[-2]), self.num_centers)
        v = x[..., jnp.array(inds), :]
        u = self.update_u(x, None, v)
        return u, v

    def loss(self, x: Array, u: Array, v: Array) -> Array:
        d = self.get_dist(x, v)
        d_avg = jnp.sum(d * u, axis=(-2, -1))
        return d_avg / (u.shape[-2] * u.shape[-1])

    def __call__(self, x: Array, *args: Any, **kwargs: Any) -> tuple[Array, Array]:
        num_grad = self.num_grad_steps
        k = self.num_iters - num_grad
        sg = jax.lax.stop_gradient
        x_ng = sg(x)

        u, v = self.initialize(x_ng if k >= 0 else x)
        for it in range(1, self.num_iters + 1):
            u, v = self.update(x_ng if it <= k else x, u, v)
        return u, v

    forward = __call__


class FuzzyCMeans(KMeans):
    """Fuzzy c-means: soft memberships with fuzzifier m (reference: kmeans.py:103-115)."""

    def __init__(self, m: float = 2, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.m = m

    def update_u(self, x: Array, u: Optional[Array], v: Array) -> Array:
        d = self.get_dist(x, v)
        u = (d + self.eps) ** (1.0 / (1.0 - self.m))
        u = (u + self.eps) / (jnp.sum(u, axis=-1, keepdims=True) + self.eps)
        return u**self.m


class EntropyKMeans(KMeans):
    """Entropy-regularized k-means: softmax memberships (reference: kmeans.py:118-136)."""

    def __init__(self, alpha: float = 0.001, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.alpha = alpha

    def update_u(self, x: Array, u: Optional[Array], v: Array) -> Array:
        d = self.get_dist(x, v)
        return jax.nn.softmax(-d / self.alpha, axis=-1)

    def loss(self, x: Array, u: Array, v: Array) -> Array:
        d = self.get_dist(x, v)
        h = jnp.where(u > self.eps, u * jnp.log(jnp.maximum(u, self.eps)), 0.0)
        h = h + (1.0 / self.num_centers) * math.log(self.num_centers)
        loss = u * d + self.alpha * h
        return jnp.sum(loss, axis=(-2, -1)) / (u.shape[-2] * u.shape[-1])
