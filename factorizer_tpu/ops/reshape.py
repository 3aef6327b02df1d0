"""Matricize / shifted-window matricize operations.

TPU-native reimplementation of the reference reshape machinery
(reference: factorizer/factorization/operations.py:147-434).  Under XLA these
compile to pure reshape/transpose/roll with no data-dependent control flow, so
the whole fold -> factorize -> unfold pipeline fuses into a handful of
layout-change + compute kernels.

All classes here are *stateless* (no parameters), so they are plain Python
objects that can be used inside Flax modules or bare jitted functions.  Both
channels-first ``(B, C, *S)`` (reference-compatible, the default) and
channels-last ``(B, *S, C)`` (TPU-native, used internally by the models)
layouts are supported via ``data_format``.
"""

from __future__ import annotations

import re
from math import prod
from typing import Optional, Sequence

import jax.numpy as jnp
from einops import rearrange
from jax import Array

from ..utils.helpers import to_ntuple

__all__ = ["Reshape", "Matricize", "SWMatricize"]

CHANNELS_FIRST = "channels_first"
CHANNELS_LAST = "channels_last"


def _parse_groups(pattern: str) -> list[list[str]]:
    """Split an einops pattern side into its top-level groups of axis names."""
    out = []
    for par, single in re.findall(r"\(([^)]+)\)|(\S+)", pattern):
        out.append(par.split() if par else [single])
    return out


def infer_axis_sizes(
    pattern: str, size: Sequence[Optional[int]], known: dict[str, int]
) -> dict[str, int]:
    """Infer unknown axis sizes of ``pattern`` given the array ``size``.

    For each group with at most one unknown axis and a known total size, the
    unknown axis is solved as ``total // prod(known)``.  Groups with an unknown
    total (``None``) or several unknown axes contribute only their already
    known axes.
    """
    inferred: dict[str, int] = {}
    for axes, total in zip(_parse_groups(pattern), size):
        known_axes = [a for a in axes if a in known]
        if total is None or len(known_axes) < len(axes) - 1:
            for a in known_axes:
                inferred[a] = known[a]
            continue
        known_prod = prod(known[a] for a in known_axes)
        for a in axes:
            inferred[a] = known.get(a, total // known_prod)
    return inferred


def compute_size(pattern: str, axis_sizes: dict[str, int]) -> tuple[Optional[int], ...]:
    """Compute the array size produced by ``pattern`` from axis sizes (None if unknown)."""
    sizes: list[Optional[int]] = []
    for axes in _parse_groups(pattern):
        if any(a not in axis_sizes for a in axes):
            sizes.append(None)
        else:
            sizes.append(prod(axis_sizes[a] for a in axes))
    return tuple(sizes)


class Reshape:
    """Bidirectional einops-style reshape with optional cyclic shifts.

    The inverse is exact: ``inverse_forward(forward(x)) == x`` for any input of
    the declared ``input_size`` (reference contract: README.md:49-51).

    Args:
        input_size: expected input size; entries may be ``None`` (e.g. batch).
        equation: einops equation, e.g. ``"b c (g p) -> b g c p"``.  ``None``
            makes this the identity.
        shifts: cyclic shift amounts applied (via ``jnp.roll``) before the
            forward rearrange and undone after the inverse rearrange.
        dims: axes the shifts apply to.
        **axis_sizes: known axis sizes for the equation.
    """

    def __init__(
        self,
        input_size: Sequence[Optional[int]],
        equation: Optional[str] = None,
        shifts: Optional[Sequence[int]] = None,
        dims: Optional[Sequence[int]] = None,
        **axis_sizes: int,
    ) -> None:
        self.input_size = tuple(input_size)
        self.equation = equation
        if equation is None:
            self.output_size = self.input_size
            self.axis_sizes: dict[str, int] = {}
        else:
            left, right = (s.strip() for s in equation.split("->"))
            self.left, self.right = left, right
            self.axis_sizes = infer_axis_sizes(left, self.input_size, axis_sizes)
            self.output_size = compute_size(right, self.axis_sizes)
            self.equation_inv = f"{right} -> {left}"

        self.shifts = tuple(shifts) if shifts is not None else None
        if self.shifts is not None:
            self.shifts_inv = tuple(-s for s in self.shifts)
            self.dims = tuple(dims)

    def forward(self, x: Array) -> Array:
        if self.shifts is not None:
            x = jnp.roll(x, self.shifts, self.dims)
        if self.equation is None:
            return x
        return rearrange(x, self.equation, **self.axis_sizes)

    __call__ = forward

    def inverse_forward(self, x: Array) -> Array:
        if self.equation is not None:
            x = rearrange(x, self.equation_inv, **self.axis_sizes)
        if self.shifts is not None:
            x = jnp.roll(x, self.shifts_inv, self.dims)
        return x


class Matricize(Reshape):
    """Fold a volume into a batch of ``(head_dim, patch_voxels)`` matrices.

    Splits channels into ``num_heads`` heads of ``head_dim`` channels and each
    spatial axis into ``grid_size`` windows of ``patch_size`` voxels, producing
    matrices of shape ``(batch*heads, windows, head_dim, patch_voxels)``
    (reference: operations.py:283-355, equation built at :321-325).

    Args:
        input_size: ``(B, C, *S)`` for channels-first (default, matching the
            reference API) or ``(B, *S, C)`` for channels-last.
        num_heads / head_dim: one of the two must be given; ``C = h * d``.
        grid_size / patch_size: one of the two must be given; ``S_i = g_i * p_i``.
        shifts: optional cyclic shift (scalar or per-spatial-axis) for the
            shifted-window scheme.
        data_format: ``"channels_first"`` or ``"channels_last"``.
    """

    def __init__(
        self,
        input_size: Sequence[Optional[int]],
        num_heads: Optional[int] = None,
        head_dim: Optional[int] = None,
        grid_size: Optional[int | Sequence[int]] = None,
        patch_size: Optional[int | Sequence[int]] = None,
        shifts: Optional[int | Sequence[int]] = None,
        data_format: str = CHANNELS_FIRST,
        **kwargs,
    ) -> None:
        if (num_heads, head_dim) == (None, None):
            raise ValueError("'num_heads' or 'head_dim' must be specified.")
        if (grid_size, patch_size) == (None, None):
            raise ValueError("'grid_size' or 'patch_size' must be specified.")

        p = len(input_size) - 2  # number of spatial axes
        self.data_format = data_format
        spatial = " ".join(f"(g{i} p{i})" for i in range(p))
        if data_format == CHANNELS_FIRST:
            left = f"b (h d) {spatial}"
            spatial_axes = tuple(range(2, 2 + p))
        elif data_format == CHANNELS_LAST:
            left = f"b {spatial} (h d)"
            spatial_axes = tuple(range(1, 1 + p))
        else:
            raise ValueError(f"Unknown data_format {data_format!r}.")
        grids = " ".join(f"g{i}" for i in range(p))
        patches = " ".join(f"p{i}" for i in range(p))
        equation = f"{left} -> (b h) ({grids}) d ({patches})"

        axis_sizes: dict[str, int] = {}
        if num_heads is not None:
            axis_sizes["h"] = max(num_heads, 1)
        if head_dim is not None:
            axis_sizes["d"] = max(head_dim, 1)
        for j, g in enumerate(to_ntuple(grid_size, p)):
            if g is not None:
                axis_sizes[f"g{j}"] = max(g, 1)
        for j, q in enumerate(to_ntuple(patch_size, p)):
            if q is not None:
                axis_sizes[f"p{j}"] = max(q, 1)

        if shifts is not None:
            shifts = to_ntuple(shifts, p)
            dims = spatial_axes
        else:
            dims = None

        super().__init__(input_size, equation=equation, shifts=shifts, dims=dims, **axis_sizes, **kwargs)


class SWMatricize:
    """Shifted-window matricize: several shifted ``Matricize`` copies.

    The forward concatenates the per-shift matricizations along the leading
    batch axis; the inverse splits, inverts each copy exactly, and averages
    (reference: operations.py:358-434).  With the default two shifts
    ``[None, patch//2]`` the average of exact inverses is itself exact.
    """

    def __init__(
        self,
        input_size: Sequence[Optional[int]],
        num_heads: Optional[int] = None,
        head_dim: Optional[int] = None,
        grid_size: Optional[int | Sequence[int]] = None,
        patch_size: Optional[int | Sequence[int]] = None,
        shifts: Optional[Sequence[None | int | Sequence[int]]] = None,
        data_format: str = CHANNELS_FIRST,
        **kwargs,
    ) -> None:
        p = len(input_size) - 2
        patch_size_t = to_ntuple(patch_size, p)
        grid_size_t = to_ntuple(grid_size, p)
        if shifts is None:
            if patch_size_t[0] is None:
                raise ValueError("Default shifts require an explicit patch_size.")
            shifts = [None, tuple(s // 2 for s in patch_size_t)]

        self.shifted_windows = [
            Matricize(
                input_size,
                num_heads=num_heads,
                head_dim=head_dim,
                grid_size=grid_size_t,
                patch_size=patch_size_t,
                shifts=s,
                data_format=data_format,
                **kwargs,
            )
            for s in shifts
        ]
        self.output_size = self.shifted_windows[0].output_size
        self.input_size = tuple(input_size)

    def forward(self, x: Array) -> Array:
        return jnp.concatenate([m.forward(x) for m in self.shifted_windows], axis=0)

    __call__ = forward

    def inverse_forward(self, x: Array) -> Array:
        n = len(self.shifted_windows)
        parts = jnp.split(x, n, axis=0)
        out = self.shifted_windows[0].inverse_forward(parts[0])
        for m, z in zip(self.shifted_windows[1:], parts[1:]):
            out = out + m.inverse_forward(z)
        return out / n
