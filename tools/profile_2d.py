#!/usr/bin/env python
"""2-D (FIVES) operating-point profiling (VERDICT round 4, item 4).

Puts chip numbers on the 2-D path the FIVES bundles ship: forward and full
train step (fwd + DiceCE + bwd + AdamW) at the deconver_fives operating
point (512^2 RGB, batch 16 — reference:
model_zoo/deconver_fives/configs/train.yaml), plus forwards for the
nnunet_fives / segresnet_fives baselines.  2-D configs use the flat mixer
path (the windowed Pallas kernel is 3-D-only by design,
models/factorizer.py), so this is the measurement that backs the 2-D
parity claim.

Results are recorded under ``profiler.json::fives_2d`` (all other keys of
the artifact are preserved).

    python tools/profile_2d.py [--spatial 512] [--batch 16] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp

from factorizer_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()


def build_models(dtype, remat: bool = False):
    import factorizer_tpu as ftx

    return {
        # zoo/deconver_fives network_def
        "deconver_fives": ftx.Deconver(
            in_channels=3, out_channels=1, spatial_dims=2,
            encoder_depth=(1,) * 5, encoder_width=(32, 64, 128, 256, 512),
            strides=(1, 2, 2, 2, 2), decoder_depth=(1,) * 4,
            norm=ftx.InstanceNorm, groups=-1, ratio=1, kernel_size=(7, 7),
            num_iters=1, mlp_ratio=4, dtype=dtype, remat=remat,
        ),
        # zoo/nnunet_fives network_def
        "nnunet_fives": ftx.DynUNet(
            in_channels=3, out_channels=1, spatial_dims=2,
            kernel_size=(3,) * 5, strides=(1, 2, 2, 2, 2),
            filters=(32, 64, 128, 256, 512), dtype=dtype,
        ),
        # zoo/segresnet_fives network_def
        "segresnet_fives": ftx.SegResNet(
            in_channels=3, out_channels=1, init_filters=32,
            upsample_mode="linear", dtype=dtype,
        ),
    }


def _time_chain(chain, k_lo: int, k_hi: int) -> float:
    def t(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            chain(k)
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(k_hi) - t(k_lo)) / (k_hi - k_lo)


def measure_forward(model, x, iters: int = 4) -> dict:
    variables = jax.jit(model.init)(jax.random.key(0), x)
    n_params = sum(a.size for a in jax.tree.leaves(variables["params"]))

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

    chain(1)
    latency = _time_chain(chain, 1, 1 + iters)
    return {
        "params": int(n_params),
        "latency_s": round(latency, 5),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
        "flops": float(ca.get("flops", float("nan"))),
    }


def measure_train(
    model, batch: int, spatial: int, iters: int = 3,
    in_ch: int = 3, out_ch: int = 1, dims: int = 2,
) -> dict:
    import optax

    from factorizer_tpu.train.losses import dice_ce_loss
    from factorizer_tpu.train.trainer import TrainState, init_opt_state

    sp = (spatial,) * dims
    x = jax.random.uniform(jax.random.key(0), (batch, in_ch, *sp), jnp.float32)
    y = (jax.random.uniform(jax.random.key(1), (batch, out_ch, *sp)) > 0.5).astype(jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(2), x)
    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=init_opt_state(tx, variables["params"], flat=True), tx=tx,
        flat_opt=True,
    )

    @jax.jit
    def one_step(state, images, labels, rng):
        def loss_fn(params):
            v = {"params": params}
            if state.buffers:
                v["buffers"] = state.buffers
            logits = model.apply(v, images, train=True, rngs={"dropout": rng})
            return dice_ce_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    def chain(k):
        s, loss = state, None
        for i in range(k):
            s, loss = one_step(s, x, y, jax.random.fold_in(jax.random.key(3), i))
        return float(loss)

    chain(1)
    step_s = _time_chain(chain, 1, 1 + iters)
    return {
        "train_step_s": round(step_s, 4),
        "img_per_s": round(batch / step_s, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--models", default="deconver_fives,nnunet_fives,segresnet_fives")
    ap.add_argument("--train", default="deconver_fives",
                    help="comma list of models to also train-step profile")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize stage activations in the train leg")
    ap.add_argument("--update", action="store_true", help="record in profiler.json")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    models = build_models(dtype, remat=args.remat)
    x1 = jax.random.uniform(
        jax.random.key(1), (1, 3, args.spatial, args.spatial), jnp.float32
    )

    out = {
        "input_shape": [1, 3, args.spatial, args.spatial],
        "train_batch": args.batch,
        "dtype": args.dtype,
        "remat": args.remat,
        "models": {},
    }
    train_set = set(filter(None, args.train.split(",")))
    for name in args.models.split(","):
        name = name.strip()
        print(f"profiling {name} (forward 1x{args.spatial}^2)...", flush=True)
        try:
            rec = measure_forward(models[name], x1)
        except Exception as e:
            out["models"][name] = {"error": repr(e)[:300]}
            print(f"  FAILED: {e!r}", flush=True)
            continue
        if name in train_set:
            print(f"  train step b{args.batch}...", flush=True)
            try:
                rec.update(measure_train(models[name], args.batch, args.spatial))
            except Exception as e:  # keep the forward record
                rec["train_error"] = repr(e)[:300]
                print(f"  train FAILED: {e!r}", flush=True)
        out["models"][name] = rec
        print(f"  {rec}", flush=True)

    print(json.dumps(out))
    if args.update:
        prof_path = _REPO / "profiler.json"
        prof = json.loads(prof_path.read_text()) if prof_path.exists() else {}
        key = "fives_2d_remat" if args.remat else "fives_2d"
        prev = prof.get(key, {})
        if prev.get("input_shape") == out["input_shape"]:
            out["models"] = {**prev.get("models", {}), **out["models"]}
        prof[key] = out
        prof_path.write_text(json.dumps(prof, indent=1))
        print(f"recorded under '{key}' in {prof_path}")


if __name__ == "__main__":
    main()
