"""Profiling & cost-analysis harness.

TPU-native equivalent of the reference's offline profiler
(reference: tests/profiler.py:15-50, DeepSpeed FLOPs profiler + torch CPU
profiler): XLA compiled-cost analysis for FLOPs/bytes and a wall-clock
latency sweep, plus an optional ``jax.profiler`` trace for opening in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Callable

import jax

__all__ = ["cost_analysis", "measure_latency", "profile_model", "trace"]


def cost_analysis(fn: Callable, *args: Any) -> dict:
    """FLOPs / bytes-accessed estimates from XLA's compiled cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-computation list
        ca = ca[0] if ca else {}
    return {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
    }


def measure_latency(fn: Callable, *args: Any, iters: int = 5, warmup: int = 1) -> float:
    """Mean wall-clock seconds per call of the jitted ``fn``."""
    jitted = jax.jit(fn)
    for _ in range(warmup):
        out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def profile_model(model, sample_input, variables=None, iters: int = 5) -> dict:
    """The profiler.py-style record for one model: flops/params/latency."""
    if variables is None:
        variables = jax.jit(model.init)(jax.random.key(0), sample_input)
    fn = lambda v, x: model.apply(v, x)  # noqa: E731
    n_params = sum(a.size for a in jax.tree.leaves(variables.get("params", variables)))
    costs = cost_analysis(fn, variables, sample_input)
    latency = measure_latency(fn, variables, sample_input, iters=iters)
    return {
        "flops": costs["flops"],
        "bytes_accessed": costs["bytes_accessed"],
        "params": int(n_params),
        "latency_s": latency,
        "input_shape": list(sample_input.shape),
        "backend": jax.default_backend(),
    }


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/jax-trace"):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dump_profile(records: dict, path: str | Path) -> None:
    Path(path).write_text(json.dumps(records, indent=2))
