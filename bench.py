"""End-to-end benchmark: flagship Swin-Factorizer forward at (1, 2, 128^3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the axon TPU tunnel defers/elides execution until a host fetch,
so we chain K forwards with a data dependency (each dispatch's input is
perturbed by the previous output's mean), force execution with a scalar
fetch, and take the slope between two K values to cancel the fixed
tunnel/dispatch overhead.  The chain is a *python-level* loop of dispatches
of one compiled forward — wrapping the chain in ``lax.scan`` makes XLA
compile the loop body differently (measured +57%: giant convert/reduce
fusions appear only inside the while body), so scan would not measure the
executable users actually run.  Device-profile cross-check: the python-loop
slope matches the XLA-op trace total within ~2%.

Baseline context (BASELINE.md): the reference repo ships only a CPU latency
for this exact model/config — 16.19 s/volume (tests/profiler.json, torch CPU,
mean of 5 no-grad forwards).  ``vs_baseline`` is measured throughput divided
by that reference throughput.  The north-star (>=4x A100 throughput) has no
in-repo A100 number to compare against.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: flagship compiles take minutes over the
# axon tunnel; cache hits make reruns (and the driver's bench run) fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REFERENCE_CPU_LATENCY_S = 16.19  # tests/profiler.json, Factorizer @ (1,2,128^3)


def _make_step(model, variables):
    """One compiled forward returning a scalar (the chain coupling value)."""

    @jax.jit
    def step(variables, x):
        y = model.apply(variables, x)
        return jnp.mean(y.astype(jnp.float32))

    return lambda x: step(variables, x)


def _chained(step, x, k: int) -> float:
    """k data-dependent dispatches of the compiled forward; scalar fetch."""
    m = step(x)
    for _ in range(k - 1):
        m = step(x + 1e-12 * m)
    return float(m)


def _time(step, x, k: int, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _chained(step, x, k)  # final float() fetch forces execution
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import os

    from __graft_entry__ import _flagship

    # bf16 activations are the TPU-native serving configuration (solver math
    # stays float32 inside the fused kernel); set FTX_BENCH_DTYPE=float32 for
    # the full-precision variant.
    dtype = os.environ.get("FTX_BENCH_DTYPE", "bfloat16")
    model = _flagship(dtype=jnp.bfloat16 if dtype == "bfloat16" else None)
    x = jax.random.uniform(jax.random.key(1), (1, 2, 128, 128, 128), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)

    k_lo, k_hi = 2, 10
    step = _make_step(model, variables)
    _chained(step, x, 2)  # compile

    t_lo = _time(step, x, k_lo)
    t_hi = _time(step, x, k_hi)
    per_iter = (t_hi - t_lo) / (k_hi - k_lo)

    vol_per_s = 1.0 / per_iter
    baseline_vol_per_s = 1.0 / REFERENCE_CPU_LATENCY_S
    print(
        json.dumps(
            {
                "metric": "factorizer_128cube_forward_throughput",
                "value": round(vol_per_s, 4),
                "unit": "volumes/sec/chip",
                "vs_baseline": round(vol_per_s / baseline_vol_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
