"""Debugging helpers: NaN trapping and pytree finiteness checks.

The TPU-native analogue of sanitizer tooling (SURVEY.md §5 — the reference
has none): ``jax_debug_nans`` makes any NaN-producing op raise with a
traceback, and :func:`assert_finite` validates whole variable/gradient trees
inside or outside jit.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["debug_nans", "assert_finite", "tree_norms"]


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Context manager: raise immediately on any NaN-producing primitive."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Host-side check that every leaf of a pytree is finite."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.isfinite(leaf).all()):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")


def tree_norms(tree: Any) -> dict[str, float]:
    """Per-leaf L2 norms (for logging gradient/param health)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[jax.tree_util.keystr(path)] = float(jnp.linalg.norm(leaf))
    return out
