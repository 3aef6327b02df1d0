#!/usr/bin/env python
"""Model profiling harness -> profiler.json.

The analogue of the reference's offline profiler artifact
(reference: tests/profiler.py:15-50 + tests/profiler.json): FLOPs /
bytes-accessed from XLA cost analysis, parameter counts, and wall-clock
forward latency (python-loop chained dispatches to defeat the axon tunnel's
lazy execution without distorting compilation — see bench.py) for every
model family at the reference's profiling input (1, 2, 128^3).

Usage:
    python tools/profile_models.py [--spatial 128] [--models factorizer,...]
                                   [--dtype bfloat16] [--output profiler.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def build_models(spatial: int, dtype):
    import factorizer_tpu as ftx

    sp3 = (spatial,) * 3
    patch = 8 if spatial >= 64 else 4
    models = {
        "factorizer": ftx.Factorizer(
            in_channels=2, out_channels=1, spatial_size=sp3,
            encoder_depth=(1,) * 5, encoder_width=(32, 64, 128, 256, 512),
            strides=(1, 2, 2, 2, 2), decoder_depth=(1,) * 4,
            reshape=(ftx.SWMatricize, {"head_dim": 8, "patch_size": patch}),
            rank=1, num_iters=5, init_method="uniform", solver="hals",
            mlp_ratio=3, dtype=dtype,
        ),
        "deconver": ftx.Deconver(
            in_channels=2, out_channels=1, spatial_dims=3,
            encoder_depth=(1,) * 5, encoder_width=(32, 64, 128, 256, 512),
            strides=(1, 2, 2, 2, 2), decoder_depth=(1,) * 4,
            norm=ftx.InstanceNorm, groups=-1, ratio=1, kernel_size=(3, 3, 3),
            num_iters=1, mlp_ratio=3,
        ),
        # Baselines pinned to the reference profiler configs
        # (reference: tests/profiler.py:95-153) so param counts are
        # apples-to-apples: SegResNet 18.97M, DynUNet 22.57M, SwinUNETR 15.7M.
        "segresnet": ftx.SegResNet(in_channels=2, out_channels=1, init_filters=32),
        "dynunet": ftx.DynUNet(
            in_channels=2, out_channels=1, kernel_size=(3,) * 5,
            strides=(1, 2, 2, 2, 2), filters=(32, 64, 128, 256, 512),
        ),
        "swinunetr": ftx.SwinUNETR(
            in_channels=2, out_channels=1, img_size=sp3, feature_size=24, window_size=7
        ),
        # reference tests/profiler.py:142-153 profiles both V1 and V2
        "swinunetr_v2": ftx.SwinUNETR(
            in_channels=2, out_channels=1, img_size=sp3, feature_size=24,
            window_size=7, use_v2=True,
        ),
        "unetr": ftx.UNETR(in_channels=2, out_channels=1, img_size=sp3, feature_size=16),
    }
    return models


def build_deconver_sweep(dtype):
    """The reference profiler's 27-config Deconver grid
    (reference: tests/profiler.py:55-73): groups x ratio x kernel_size over
    ([1, 4, 8, -1], [1, 4, 8], [3, 5, 7]) filtered to -1 <= groups*ratio <= 32,
    at the same 5-stage widths as the flagship config.

    Param parity note: instantiating the REFERENCE code at these configs
    matches this sweep exactly (e.g. g8/r4/k7 -> 84.33 M both), but the
    reference's shipped tests/profiler.json disagrees for some ratio>1
    grouped configs (10.92 M for that key) — their artifact predates the
    current h0 parameter shape, so parity is asserted against the code."""
    import itertools

    import factorizer_tpu as ftx

    models = {}
    for groups, ratio, ks in itertools.product([1, 4, 8, -1], [1, 4, 8], [3, 5, 7]):
        if not (-1 <= groups * ratio <= 32):
            continue
        models[f"deconver_g{groups}_r{ratio}_k{ks}"] = ftx.Deconver(
            in_channels=2, out_channels=1, spatial_dims=3,
            encoder_depth=(1,) * 5, encoder_width=(32, 64, 128, 256, 512),
            strides=(1, 2, 2, 2, 2), decoder_depth=(1,) * 4,
            norm=ftx.InstanceNorm, groups=groups, ratio=ratio,
            kernel_size=(ks, ks, ks), num_iters=1, mlp_ratio=3, dtype=dtype,
        )
    return models


def measure(model, x, iters: int) -> dict:
    variables = jax.jit(model.init)(jax.random.key(0), x)
    n_params = sum(a.size for a in jax.tree.leaves(variables["params"]))

    # Python-level chain of dispatches of ONE compiled forward: wrapping the
    # chain in lax.scan makes XLA compile the loop body differently from the
    # executable users run (measured +57% on the flagship, see bench.py).
    # variables as a traced ARG: closing over them would bake hundreds of MB
    # of weights into the HLO as constants for the larger models.
    @jax.jit
    def step(v, x):
        out = model.apply(v, x)
        y = out[0] if isinstance(out, (list, tuple)) else out
        return jnp.mean(y.astype(jnp.float32))

    ca = step.lower(variables, x).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}

    def chain(k):
        m = step(variables, x)
        for _ in range(k - 1):
            m = step(variables, x + 1e-12 * m)
        return float(m)

    chain(1)  # compile
    k_lo, k_hi = 1, 1 + iters
    t_lo = min(_t(chain, k_lo) for _ in range(2))
    t_hi = min(_t(chain, k_hi) for _ in range(2))
    latency = (t_hi - t_lo) / (k_hi - k_lo)

    return {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
        "params": int(n_params),
        "latency_s": latency,
    }


def _t(f, *args) -> float:
    t0 = time.perf_counter()
    f(*args)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", type=int, default=128)
    ap.add_argument(
        "--models",
        default="factorizer,deconver,segresnet,dynunet,swinunetr,swinunetr_v2,unetr",
    )
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--output", default="profiler.json")
    ap.add_argument(
        "--sweep", action="store_true",
        help="profile the reference's 27-config Deconver groups x ratio x "
        "kernel grid instead of the named families",
    )
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    if args.sweep:
        models = build_deconver_sweep(dtype)
        args.models = ",".join(models)
    else:
        models = build_models(args.spatial, dtype)
    x = jax.random.uniform(
        jax.random.key(1), (1, 2, args.spatial, args.spatial, args.spatial), jnp.float32
    )

    results = {
        "input_shape": list(x.shape),
        "backend": jax.default_backend(),
        "dtype": args.dtype,
        "models": {},
    }
    out_path = Path(args.output)
    if out_path.exists():  # merge into an existing artifact
        try:
            prev = json.loads(out_path.read_text())
            if prev.get("input_shape") == results["input_shape"]:
                results["models"].update(prev.get("models", {}))
            # preserve sibling artifacts (eval_native, fives_2d, ...) other
            # tools record into the same file
            for k, v in prev.items():
                if k not in ("input_shape", "backend", "dtype", "models"):
                    results[k] = v
        except (json.JSONDecodeError, OSError):
            pass
    for name in args.models.split(","):
        name = name.strip()
        print(f"profiling {name}...", flush=True)
        try:
            results["models"][name] = measure(models[name], x, args.iters)
            print(f"  {results['models'][name]}", flush=True)
        except Exception as e:  # keep going; record the failure
            results["models"][name] = {"error": repr(e)[:200]}
            print(f"  FAILED: {e!r}", flush=True)

    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
