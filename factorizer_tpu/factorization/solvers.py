"""Block-coordinate-descent solvers for matrix factorization ``X ≈ U Vᵀ``.

TPU-native reimplementation of the reference solver family
(reference: factorizer/factorization/matrix_factorization.py:108-378,590-618).
Each solver is a *stateless* plain-Python object whose ``update_u`` /
``update_v`` are pure ``jnp`` functions: one call is one BCD iteration.  They
are driven by a statically unrolled loop in
:class:`~factorizer_tpu.factorization.nmf.MatrixFactorization`, so XLA fuses
the small batched matmuls and elementwise eps-regularized divides across
iterations.

Numerics note: denominators carry ``eps = 1e-16`` which underflows in
bfloat16; solver math should run in float32 (the layers upcast around the
factorization; see SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import Array

from ..utils.helpers import as_tuple, is_partializable, partialize

__all__ = [
    "BCDSolver",
    "LeastSquares",
    "ProjectedGradient",
    "CoordinateDescent",
    "MultiplicativeUpdate",
    "FastMultiplicativeUpdate",
    "WeightedMultiplicativeUpdate",
    "SemiMultiplicativeUpdate",
    "Compose",
    "SOLVER_DISPATCH_MAP",
    "parse_solver",
]

EPS = 1e-16

Factors = tuple[Array, Array]


def _mT(x: Array) -> Array:
    return jnp.swapaxes(x, -1, -2)


def _resolve_project(project) -> Callable[[Array], Array]:
    if project is None:
        return lambda x: x
    project = partialize(project)
    # Accept either a ready elementwise function (jax.nn.relu) or a factory
    # returning one (reference passes classes like nn.ReLU).
    try:
        probe = project(jnp.zeros(()))
        if isinstance(probe, jnp.ndarray):
            return project
    except TypeError:
        pass
    return project()


class BCDSolver:
    """Base class: one block-coordinate-descent iteration for ``X ≈ U Vᵀ``.

    Args:
        factor: which factors to update and in which order; subset of ``{0, 1}``
            (0 = U, 1 = V).
    """

    def __init__(self, factor: Sequence[int] = (0, 1), *args: Any, **kwargs: Any) -> None:
        self.factor = as_tuple(factor)
        if not set(self.factor).issubset({0, 1}):
            raise ValueError("`factor` elements must be 0 or 1.")

    def update_u(self, x: Array, u: Array, v: Array) -> Array:
        raise NotImplementedError

    def update_v(self, x: Array, u: Array, v: Array) -> Array:
        # By symmetry: V solves the transposed problem Xᵀ ≈ V Uᵀ.
        return self.update_u(_mT(x), v, u)

    def __call__(self, x: Array, factors: Factors, *args: Any, **kwargs: Any) -> Factors:
        u, v = factors
        for j in self.factor:
            if j == 0:
                u = self.update_u(x, u, v)
            else:
                v = self.update_v(x, u, v)
        return u, v


class LeastSquares(BCDSolver):
    """Exact (optionally projected) least-squares update."""

    def __init__(
        self,
        factor: Sequence[int] = (0, 1),
        eps: float = EPS,
        project=None,
        **kwargs: Any,
    ) -> None:
        super().__init__(factor=factor)
        self.eps = eps
        self.project = _resolve_project(project)

    def update_u(self, x: Array, u: Array, v: Array) -> Array:
        M, N = x.shape[-2], x.shape[-1]
        if M >= N:
            u_new = x @ _mT(jnp.linalg.pinv(v))
        else:
            a, b = x @ v, _mT(v) @ v
            u_new = _mT(jnp.linalg.solve(b, _mT(a)))
        return self.project(u_new)


class ProjectedGradient(BCDSolver):
    """Projected gradient descent with exact line search for the LS subproblem."""

    def __init__(
        self,
        factor: Sequence[int] = (0, 1),
        project=None,
        eps: float = EPS,
        **kwargs: Any,
    ) -> None:
        super().__init__(factor=factor)
        self.eps = eps
        self.project = _resolve_project(project)

    def update_u(self, x: Array, u: Array, v: Array) -> Array:
        a, b = x @ v, _mT(v) @ v
        g = a - u @ b
        gg = jnp.sum(g * g, axis=(-2, -1))[..., None]
        ggb = jnp.sum(g * (g @ b), axis=(-2, -1))[..., None]
        eta = ((gg + self.eps) / (ggb + self.eps))[..., None]
        return self.project(u + eta * g)


class CoordinateDescent(BCDSolver):
    """Per-rank block coordinate descent (HALS when projected to ReLU).

    The rank loop is sequential (column ``r`` uses already-updated columns) and
    statically unrolled; rank 1 takes the closed-form fast path
    (reference: matrix_factorization.py:210-229).
    """

    def __init__(
        self,
        factor: Sequence[int] = (0, 1),
        eps: float = EPS,
        project=None,
        **kwargs: Any,
    ) -> None:
        super().__init__(factor=factor)
        self.eps = eps
        self.project = _resolve_project(project)

    def update_u(self, x: Array, u: Array, v: Array) -> Array:
        R = u.shape[-1]
        a, b = x @ v, _mT(v) @ v
        if R == 1:
            return self.project((a + self.eps) / (b + self.eps))

        cols = [u[..., r : r + 1] for r in range(R)]
        for r in range(R):
            others = [j for j in range(R) if j != r]
            u_others = jnp.concatenate([cols[j] for j in others], axis=-1)
            b_others = b[..., others, r : r + 1]
            numerator = a[..., r : r + 1] - u_others @ b_others + self.eps
            denominator = b[..., r : r + 1, r : r + 1] + self.eps
            cols[r] = self.project(numerator / denominator)
        return jnp.concatenate(cols, axis=-1)


class MultiplicativeUpdate(BCDSolver):
    """Lee-Seung multiplicative update for NMF."""

    def __init__(self, factor: Sequence[int] = (0, 1), eps: float = EPS, **kwargs: Any) -> None:
        super().__init__(factor=factor)
        self.eps = eps

    def update_u(self, x: Array, u: Array, v: Array) -> Array:
        a, b = x @ v, _mT(v) @ v
        return (u * a + self.eps) / (u @ b + self.eps)


class FastMultiplicativeUpdate(BCDSolver):
    """Multiplicative update in fully einsum form (lets XLA pick contraction order)."""

    def __init__(self, factor: Sequence[int] = (0, 1), eps: float = EPS, **kwargs: Any) -> None:
        super().__init__(factor=factor)
        self.eps = eps

    def update_u(self, x: Array, u: Array, v: Array) -> Array:
        numerator = jnp.einsum("...ij,...ir,...jr->...ir", x, u, v) + self.eps
        denominator = jnp.einsum("...is,...js,...jr->...ir", u, v, v) + self.eps
        return numerator / denominator

    def update_v(self, x: Array, u: Array, v: Array) -> Array:
        numerator = jnp.einsum("...ij,...ir,...jr->...jr", x, u, v) + self.eps
        denominator = jnp.einsum("...ir,...is,...js->...jr", u, u, v) + self.eps
        return numerator / denominator


class WeightedMultiplicativeUpdate(BCDSolver):
    """Multiplicative update for weighted NMF: ``min ||W ⊙ (X - U Vᵀ)||²``."""

    def __init__(self, factor: Sequence[int] = (0, 1), eps: float = EPS, **kwargs: Any) -> None:
        super().__init__(factor=factor)
        self.eps = eps

    def update_u(self, x: Array, u: Array, v: Array, w: Array) -> Array:
        a = (w * x) @ v
        numerator = u * a + self.eps
        denominator = (w * (u @ _mT(v))) @ v + self.eps
        return numerator / denominator

    def update_v(self, x: Array, u: Array, v: Array, w: Array) -> Array:
        return self.update_u(_mT(x), v, u, _mT(w))

    def __call__(
        self, x: Array, factors: Factors, w: Optional[Array] = None, **kwargs: Any
    ) -> Factors:
        u, v = factors
        w = jnp.ones_like(x) if w is None else w
        for j in self.factor:
            if j == 0:
                u = self.update_u(x, u, v, w)
            else:
                v = self.update_v(x, u, v, w)
        return u, v


class SemiMultiplicativeUpdate(BCDSolver):
    """Multiplicative update for semi-NMF (only U constrained nonnegative)."""

    def __init__(self, factor: Sequence[int] = (0, 1), eps: float = EPS, **kwargs: Any) -> None:
        super().__init__(factor=factor)
        self.eps = eps

    def update_u(self, x: Array, u: Array, v: Array) -> Array:
        a, b = x @ v, _mT(v) @ v
        relu = jax.nn.relu
        numerator = relu(a) + u @ relu(-b) + self.eps
        denominator = relu(-a) + u @ relu(b) + self.eps
        return u * jnp.sqrt(numerator / denominator)


class Compose(BCDSolver):
    """Run several solvers in sequence within one iteration."""

    def __init__(self, solvers: Optional[Sequence] = None, **kwargs: Any) -> None:
        solvers = [] if solvers is None else as_tuple(solvers)
        self.solvers = [partialize(s)(**kwargs) for s in solvers]
        self.factor = [s.factor for s in self.solvers]
        self.size = kwargs.get("size")
        self.rank = kwargs.get("rank")

    def __call__(self, x: Array, factors: Factors, *args: Any, **kwargs: Any) -> Factors:
        u, v = factors
        for solver in self.solvers:
            u, v = solver(x, (u, v))
        return u, v

    def __getitem__(self, idx: int) -> BCDSolver:
        return self.solvers[idx]

    def __len__(self) -> int:
        return len(self.solvers)


# String registry, matching the reference names exactly
# (reference: matrix_factorization.py:590-618).  Note "wmu-0"/"wmu-1" dispatch
# to the plain MultiplicativeUpdate, as in the reference.
SOLVER_DISPATCH_MAP: dict[str, Any] = {
    "mu": MultiplicativeUpdate,
    "mu-0": (MultiplicativeUpdate, {"factor": 0}),
    "mu-1": (MultiplicativeUpdate, {"factor": 1}),
    "fmu": FastMultiplicativeUpdate,
    "fmu-0": (FastMultiplicativeUpdate, {"factor": 0}),
    "fmu-1": (FastMultiplicativeUpdate, {"factor": 1}),
    "wmu": WeightedMultiplicativeUpdate,
    "wmu-0": (MultiplicativeUpdate, {"factor": 0}),
    "wmu-1": (MultiplicativeUpdate, {"factor": 1}),
    "smu": SemiMultiplicativeUpdate,
    "smu-0": (SemiMultiplicativeUpdate, {"factor": 0}),
    "smu-1": (SemiMultiplicativeUpdate, {"factor": 1}),
    "cd": CoordinateDescent,
    "cd-0": (CoordinateDescent, {"factor": 0}),
    "cd-1": (CoordinateDescent, {"factor": 1}),
    "nncd": (CoordinateDescent, {"project": jax.nn.relu}),
    "nncd-0": (CoordinateDescent, {"factor": 0, "project": jax.nn.relu}),
    "nncd-1": (CoordinateDescent, {"factor": 1, "project": jax.nn.relu}),
    "hals": (CoordinateDescent, {"project": jax.nn.relu}),
    "hals-0": (CoordinateDescent, {"factor": 0, "project": jax.nn.relu}),
    "hals-1": (CoordinateDescent, {"factor": 1, "project": jax.nn.relu}),
    "ls": LeastSquares,
    "ls-0": (LeastSquares, {"factor": 0}),
    "ls-1": (LeastSquares, {"factor": 1}),
    "nnls": (LeastSquares, {"project": jax.nn.relu}),
    "nnls-0": (LeastSquares, {"factor": 0, "project": jax.nn.relu}),
    "nnls-1": (LeastSquares, {"factor": 1, "project": jax.nn.relu}),
}


def parse_solver(obj: Any) -> Any:
    """Resolve a solver spec (string, partializable, or sequence) to a partializable."""
    if is_partializable(obj):
        return obj
    if isinstance(obj, str):
        return SOLVER_DISPATCH_MAP.get(obj, obj)
    if isinstance(obj, Sequence):
        out = []
        for x in obj:
            if is_partializable(x):
                out.append(x)
            elif isinstance(x, str):
                out.append(SOLVER_DISPATCH_MAP.get(x, x))
            else:
                raise ValueError(f"Cannot parse solver element {x!r}.")
        return (Compose, {"solvers": out})
    raise ValueError(f"Cannot parse solver {obj!r}.")
