#!/usr/bin/env python
"""Flagship-scale regression gate (VERDICT round 2, item 6).

Runs the configuration the bench and the paper care about — 5 stages,
SWMatricize p=8 d=8 x4 shifts, 128^3, bf16, fused Pallas kernels — on the
real TPU: one forward and one full train step.  Asserts finiteness and a
latency ceiling (>20% regression fails), so a flagship-only break (e.g. in
the fused kernel's 4-shift path) cannot pass CI silently.

Run as part of the round's verify flow:

    python tools/flagship_gate.py            # exits 1 on regression
    python tools/flagship_gate.py --update   # rewrite the stored baselines

Baselines live in tools/flagship_gate.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO_ROOT))

import jax
import jax.numpy as jnp

from factorizer_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

BASELINE_PATH = Path(__file__).with_suffix(".json")
TOLERANCE = 1.20  # fail at >20% regression


def measure() -> dict:
    import bench

    from __graft_entry__ import _flagship

    model = _flagship(dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.key(1), (1, 2, 128, 128, 128), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)

    step, _ = bench._make_step(model, variables)
    first = bench._chained(step, x, 2)
    if first != first:  # NaN
        raise SystemExit("GATE FAIL: flagship forward produced NaN")
    t_lo = bench._time(step, x, 2)
    t_hi = bench._time(step, x, 10)
    fwd_s = (t_hi - t_lo) / 8

    # the amp=false (f32) operating point: the stock-bundle default must not
    # silently regress either (the bf16 row is what amp: true reaches)
    model32 = _flagship(dtype=None)
    variables32 = jax.jit(model32.init)(jax.random.key(0), x)
    step32, _ = bench._make_step(model32, variables32)
    bench._chained(step32, x, 2)
    fwd32_s = (bench._time(step32, x, 10) - bench._time(step32, x, 2)) / 8

    train_s, _ = bench._train_step_time(jnp.bfloat16)

    # Second flagship family: the deconver_brats23 operating point (VERDICT
    # round 4, item 3 — 128^3 b2 train step exercising the packed update_s
    # custom VJPs at flagship scale).
    sys.path.insert(0, str(_REPO_ROOT / "tools"))
    from bench_train import build_model

    deconver = build_model("deconver", 128, jnp.bfloat16)
    deconver_train_s, _ = bench._train_step_time(jnp.bfloat16, model=deconver)

    # 2-D family: the deconver_fives operating point (512^2 b16 + remat,
    # exercising the 2-D mapping of the lane-packed depthwise kernel).
    from profile_2d import build_models, measure_train

    fives = build_models(jnp.bfloat16, remat=True)["deconver_fives"]
    fives_train_s = measure_train(fives, 16, 512)["train_step_s"]

    return {
        "forward_s": fwd_s,
        "forward_f32_s": fwd32_s,
        "train_step_s_b2": train_s,
        "deconver_train_step_s_b2": deconver_train_s,
        "fives_train_step_s_b16": fives_train_s,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true", help="store measured values as the new baseline")
    args = ap.parse_args()

    t0 = time.time()
    got = measure()
    print(json.dumps({**got, "elapsed_s": round(time.time() - t0, 1)}))

    if args.update or not BASELINE_PATH.exists():
        BASELINE_PATH.write_text(json.dumps({k: round(v, 4) for k, v in got.items()}, indent=2))
        print(f"baseline written to {BASELINE_PATH}")
        return 0

    base = json.loads(BASELINE_PATH.read_text())
    ok = True
    new_keys = {k: round(v, 4) for k, v in got.items() if k not in base}
    if new_keys:
        base.update(new_keys)
        BASELINE_PATH.write_text(json.dumps(base, indent=2))
        print(f"pinned new keys {sorted(new_keys)} into {BASELINE_PATH}")
    for key, value in got.items():
        ceiling = base[key] * TOLERANCE
        status = "ok" if value <= ceiling else "REGRESSION"
        if value > ceiling:
            ok = False
        print(f"{key}: {value:.4f} s (baseline {base[key]:.4f}, ceiling {ceiling:.4f}) {status}")
    print("GATE PASS" if ok else "GATE FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
