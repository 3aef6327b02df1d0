"""Differentiable matrix-factorization layers (MF / NMF).

TPU-native counterpart of the reference core layer
(reference: factorizer/factorization/matrix_factorization.py:454-578).  The
iterative solve is a statically unrolled loop of pure solver steps, so under
``jax.jit`` the whole decompose -> reconstruct pipeline compiles to one fused
XLA computation.  The ``torch.no_grad()`` gradient-truncation contexts
(:506-512) become a ``stop_gradient`` phase: the first
``num_iters - num_grad_steps`` iterations consume ``stop_gradient(x)`` so the
factors entering the differentiable tail are constants w.r.t. autodiff —
exactly the reference's autograd semantics.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..ops.math import relative_error
from ..utils.helpers import partialize
from .inits import parse_init
from .solvers import parse_solver
from .svd import infer_rank

__all__ = ["MatrixFactorization", "NMF", "translate_mf_kwargs"]


def translate_mf_kwargs(kwargs: dict[str, Any]) -> dict[str, Any]:
    """Map the reference's ``init=`` kwarg to our ``init_method=`` field.

    Flax reserves ``Module.init``, so the constructor field is renamed; this
    shim keeps reference-style config dicts working.
    """
    kwargs = dict(kwargs)
    if "init" in kwargs:
        kwargs.setdefault("init_method", kwargs.pop("init"))
    return kwargs


class MatrixFactorization(nn.Module):
    """Differentiable ``X ≈ U Vᵀ`` layer (shape-preserving ``forward``).

    Attributes:
        size: ``(M, N)`` size of the factorized matrices (trailing two axes).
        rank: factorization rank; inferred from ``compression`` if None via
            ``rank = ceil(MN / (compression (M+N)))``.
        compression: target compression for the auto-rank rule.
        init_method: initializer spec — ``"uniform" | "normal" | "svd" |
            "nndsvd"``, a class, or ``(class, kwargs)``.  (Reference kwarg
            name: ``init``; renamed because Flax reserves ``Module.init``.)
        solver: solver spec — a registry string (``"hals"``, ``"mu"``, ...), a
            class, ``(class, kwargs)``, or a sequence thereof (composed).
        num_iters: number of BCD iterations.
        num_grad_steps: how many trailing iterations are differentiable
            (default: all).
        eps: regularizer added to solver denominators.
        project: optional projection override passed to the solver.
    """

    size: Sequence[int]
    rank: Optional[int] = None
    compression: float = 10.0
    init_method: Any = "normal"
    solver: Any = "cd"
    num_iters: int = 5
    num_grad_steps: Optional[int] = None
    eps: Optional[float] = None
    project: Any = None
    verbose: bool = False
    use_pallas: Optional[bool] = None  # None = auto (TPU, single device, hals/mu)

    def setup(self) -> None:
        rank, compression = infer_rank(tuple(self.size), self.rank, self.compression)
        self.rank_ = rank
        self.compression_ = compression

        init_spec = parse_init(self.init_method)
        self.initializer = partialize(init_spec)(size=tuple(self.size), rank=rank)

        opts: dict[str, Any] = {"size": tuple(self.size), "rank": rank}
        if self.eps is not None:
            opts["eps"] = self.eps
        if self.project is not None:
            opts["project"] = self.project
        self.solver_ = partialize(parse_solver(self.solver))(**opts)

    def decompose(self, x: Array, *args: Any, **kwargs: Any) -> tuple[Array, Array]:
        """Run the initializer and ``num_iters`` solver iterations on ``x``.

        ``x``: array of shape ``(..., M, N)``.  Returns ``u: (..., M, R)`` and
        ``v: (..., N, R)``.
        """
        num_grad = self.num_iters if self.num_grad_steps is None else self.num_grad_steps
        k = self.num_iters - num_grad  # leading no-grad iterations
        x_ng = jax.lax.stop_gradient(x)

        u, v = self.initializer(x_ng if k >= 0 else x)
        for it in range(1, self.num_iters + 1):
            u, v = self.solver_(x_ng if it <= k else x, (u, v), *args, **kwargs)
        return u, v

    def reconstruct(self, u: Array, v: Array) -> Array:
        return u @ jnp.swapaxes(v, -1, -2)

    def loss(self, x: Array, u: Array, v: Array, w: Optional[Array] = None) -> Array:
        return relative_error(x, self.reconstruct(u, v), w)

    def _fused_eligible(self) -> bool:
        """Whether the fused Pallas kernel covers this exact configuration."""
        from ..ops.pallas import nmf_kernel as _pk
        from .inits import RandomInit

        if not (
            isinstance(self.solver, str)
            and self.solver in ("hals", "mu")
            and self.project is None
            and isinstance(self.initializer, RandomInit)
            and _pk.supports(self.solver, self.rank_, tuple(self.size))
        ):
            return False
        if self.use_pallas is not None:
            return bool(self.use_pallas)
        # Auto mode: fused kernel on TPU, single- or multi-chip.  The kernel
        # carries a custom_partitioning rule (ops/pallas/partitioning.py), so
        # GSPMD shards it along the batch/window/head dims of the folded
        # input instead of dropping to the unfused path at scale.
        devices = jax.devices()
        return devices[0].platform == "tpu"

    def __call__(self, x: Array) -> Array:
        if x.ndim >= 3 and self._fused_eligible():
            from ..ops.pallas.nmf_kernel import nmf_reconstruct

            u0, v0 = self.initializer.tables()
            return nmf_reconstruct(
                x,
                u0,
                v0,
                self.solver,
                self.num_iters,
                self.eps if self.eps is not None else 1e-16,
                self.num_grad_steps,
            )
        # Solver numerics want >= float32 (eps-regularized divides); the fused
        # kernel above reads low-precision inputs and upcasts in VMEM, while
        # the XLA path upcasts here and casts the reconstruction back.
        if x.dtype in (jnp.bfloat16, jnp.float16):
            u, v = self.decompose(x.astype(jnp.float32))
            return self.reconstruct(u, v).astype(x.dtype)
        u, v = self.decompose(x)
        return self.reconstruct(u, v)


class NMF(MatrixFactorization):
    """Nonnegative matrix factorization: ``X ≈ U Vᵀ`` with ``U, V ≥ 0``.

    Defaults to uniform init + HALS, as in the reference
    (matrix_factorization.py:549-578).
    """

    init_method: Any = "uniform"
    solver: Any = "hals"
