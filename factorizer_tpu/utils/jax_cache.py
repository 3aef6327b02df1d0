"""Shared persistent XLA compile-cache setup for the repo's entry scripts.

Flagship compiles take minutes over the axon TPU tunnel; one cache dir at
the repo root (bench.py, __graft_entry__.py, tools/* all share it) makes
reruns and the driver's bench run fast.  Call before the first jit.
"""

from __future__ import annotations

from pathlib import Path

import jax

__all__ = ["configure_compile_cache"]

_REPO_ROOT = Path(__file__).resolve().parents[2]


def configure_compile_cache(min_compile_secs: float = 5.0) -> None:
    jax.config.update("jax_compilation_cache_dir", str(_REPO_ROOT / ".cache" / "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
