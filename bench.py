"""End-to-end benchmark: flagship Swin-Factorizer forward at (1, 2, 128^3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference repo ships only a CPU latency
for this exact model/config — 16.19 s/volume (tests/profiler.json, torch CPU,
mean of 5 no-grad forwards).  ``vs_baseline`` is measured throughput divided
by that reference throughput (0.0618 vol/s).  The north-star target
(>=4x A100 throughput) has no in-repo A100 number to compare against.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_CPU_LATENCY_S = 16.19  # tests/profiler.json, Factorizer @ (1,2,128^3)


def main() -> None:
    from __graft_entry__ import _flagship

    model = _flagship()
    x = jnp.zeros((1, 2, 128, 128, 128), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)

    fwd = jax.jit(lambda v, x: model.apply(v, x))

    # Warmup / compile.
    y = fwd(variables, x)
    jax.block_until_ready(y)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fwd(variables, x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters

    vol_per_s = 1.0 / dt
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
