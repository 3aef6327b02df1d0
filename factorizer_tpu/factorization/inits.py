"""Factor-matrix initializers for matrix factorization.

TPU-native counterpart of the reference initializers
(reference: factorizer/factorization/matrix_factorization.py:19-100,581-588).
``RandomInit`` stores its shared, non-trainable ``u0``/``v0`` in the Flax
``"buffers"`` variable collection (the analogue of torch's registered
buffers), created once from the params RNG at module init and broadcast to the
input's batch dims on every call.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..utils.helpers import as_tuple, is_partializable
from .svd import SVD

__all__ = ["RandomInit", "SVDInit", "NNDSVDInit", "INIT_DISPATCH_MAP", "parse_init"]

_SAMPLERS = {
    "uniform": lambda key, shape: jax.random.uniform(key, shape, jnp.float32),
    "normal": lambda key, shape: jax.random.normal(key, shape, jnp.float32),
}


class RandomInit(nn.Module):
    """Random factors ``(u0, v0)`` shared across the batch.

    Buffers live in the ``"buffers"`` collection so they checkpoint like
    parameters but receive no gradient, matching the reference's
    ``register_buffer`` semantics (matrix_factorization.py:45-58).

    Attributes:
        rank: factorization rank R.
        size: matrix size ``(M, N)``.
        method: ``"uniform"`` / ``"normal"`` or a per-factor pair.
    """

    rank: int
    size: Sequence[int]
    method: Any = "uniform"

    def setup(self) -> None:
        methods = as_tuple(self.method)
        if len(methods) == 1:
            mu = mv = methods[0]
        elif len(methods) == 2:
            mu, mv = methods
        else:
            raise ValueError("`method` not valid.")

        # Deterministic per-buffer stream ids: Python's str hash is salted per
        # process, which would make u0/v0 irreproducible across runs and
        # silently divergent across hosts in multi-host training.
        stream_ids = {"u0": 0, "v0": 1}

        def make(method: str, n: int, name: str):
            def init_fn() -> Array:
                key = jax.random.fold_in(self.make_rng("params"), stream_ids[name])
                return _SAMPLERS[method](key, (n, self.rank))

            return init_fn

        self._u0 = self.variable("buffers", "u0", make(mu, self.size[0], "u0"))
        self._v0 = self.variable("buffers", "v0", make(mv, self.size[1], "v0"))

    def tables(self) -> tuple[Array, Array]:
        """The raw shared ``(M, R)`` / ``(N, R)`` buffers (for fused kernels)."""
        return self._u0.value, self._v0.value

    def __call__(self, x: Array) -> tuple[Array, Array]:
        u0, v0 = self.tables()
        batch = x.shape[:-2]
        u = jnp.broadcast_to(u0, (*batch, *u0.shape)).astype(x.dtype)
        v = jnp.broadcast_to(v0, (*batch, *v0.shape)).astype(x.dtype)
        return u, v


class SVDInit:
    """Initialize factors from a truncated SVD: ``u = U√s``, ``v = V√s``."""

    def __init__(self, size: Sequence[int], rank: Optional[int] = None, **kwargs: Any) -> None:
        self.svd = SVD(size=size, rank=rank)

    def __call__(self, x: Array) -> tuple[Array, Array]:
        u, s, v = self.svd.decompose(x)
        s = jnp.sqrt(s)
        return u * s[..., None, :], v * s[..., None, :]


class NNDSVDInit:
    """Nonnegative double SVD initialization (Boutsidis & Gallopoulos).

    Per rank, keeps whichever sign pattern of the singular vectors carries more
    mass, selected per batch element
    (reference: matrix_factorization.py:74-100, generalized to arbitrary
    leading batch dims via ``jnp.where``).
    """

    def __init__(self, size: Sequence[int], rank: Optional[int] = None, **kwargs: Any) -> None:
        self.svd = SVD(size=size, rank=rank)

    def __call__(self, x: Array) -> tuple[Array, Array]:
        u, s, v = self.svd.decompose(x)
        s = jnp.sqrt(s)
        u = u * s[..., None, :]
        v = v * s[..., None, :]

        relu = jax.nn.relu
        u_cols, v_cols = [], []
        for r in range(self.svd.rank):
            a, b = u[..., :, r], v[..., :, r]
            ap, an = relu(a), relu(-a)
            bp, bn = relu(b), relu(-b)
            abp = jnp.linalg.norm(ap, axis=-1) * jnp.linalg.norm(bp, axis=-1)
            abn = jnp.linalg.norm(an, axis=-1) * jnp.linalg.norm(bn, axis=-1)
            mask = (abp >= abn)[..., None]
            u_cols.append(jnp.where(mask, ap, an))
            v_cols.append(jnp.where(mask, bp, bn))

        return jnp.stack(u_cols, axis=-1), jnp.stack(v_cols, axis=-1)


INIT_DISPATCH_MAP: dict[str, Any] = {
    "uniform": (RandomInit, {"method": "uniform"}),
    "normal": (RandomInit, {"method": "normal"}),
    "normal-uniform": (RandomInit, {"method": ("normal", "uniform")}),
    "uniform-normal": (RandomInit, {"method": ("uniform", "normal")}),
    "svd": SVDInit,
    "nndsvd": NNDSVDInit,
}


def parse_init(obj: Any) -> Any:
    """Resolve an initializer spec (string or partializable) to a partializable."""
    if isinstance(obj, str):
        return INIT_DISPATCH_MAP.get(obj, obj)
    if is_partializable(obj):
        return obj
    raise ValueError(f"Cannot parse init {obj!r}.")
