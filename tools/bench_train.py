#!/usr/bin/env python
"""Training-step throughput benchmark for the flagship Factorizer.

Measures one full train step (forward + DiceCE + backward + AdamW) at the
BraTS23 bundle's operating point, with the chained-step timing methodology
from bench.py (data dependency between steps, host-fetch forcing, slope
between two chain lengths to cancel tunnel overhead).
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


def build_model(name: str, spatial: int, dtype, remat: bool = False):
    """The bundle operating-point model configs (zoo/*_brats23 network_def)."""
    import factorizer_tpu as ftx

    sp = (spatial,) * 3
    if name == "deconver":
        # zoo/deconver_brats23/configs/train.yaml network_def
        return ftx.Deconver(
            in_channels=4, out_channels=3, spatial_dims=3,
            encoder_depth=(1,) * 5, encoder_width=(32, 64, 128, 256, 512),
            strides=(1, 2, 2, 2, 2), decoder_depth=(1,) * 4,
            norm=ftx.InstanceNorm, groups=-1, ratio=1, kernel_size=(3, 3, 3),
            num_iters=1, mlp_ratio=4, dtype=dtype, remat=remat,
        )
    return ftx.Factorizer(
        in_channels=4,
        out_channels=3,
        spatial_size=sp,
        encoder_depth=(1,) * 5,
        encoder_width=(32, 64, 128, 256, 512),
        strides=(1, 2, 2, 2, 2),
        decoder_depth=(1,) * 4,
        reshape=(ftx.SWMatricize, {"head_dim": 8, "patch_size": 8}),
        rank=1,
        num_iters=5,
        init_method="uniform",
        solver="hals",
        mlp_ratio=4,
        dtype=dtype,
        remat=remat,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--model", default="factorizer", choices=["factorizer", "deconver"])
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize stage activations (fits configs that OOM)")
    args = ap.parse_args()

    import optax

    import factorizer_tpu as ftx
    from factorizer_tpu.train.losses import dice_ce_loss
    from factorizer_tpu.train.trainer import TrainState, init_opt_state

    sp = (args.spatial,) * 3
    model = build_model(
        args.model, args.spatial,
        jnp.bfloat16 if args.dtype == "bfloat16" else None, remat=args.remat,
    )
    x = jax.random.uniform(jax.random.key(0), (args.batch, 4, *sp), jnp.float32)
    y = (jax.random.uniform(jax.random.key(1), (args.batch, 3, *sp)) > 0.5).astype(jnp.float32)

    variables = jax.jit(model.init)(jax.random.key(2), x)
    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=init_opt_state(tx, variables["params"], flat=True),
        tx=tx,
        flat_opt=True,
    )

    def one_step(state, rng):
        def loss_fn(params):
            v = {"params": params}
            if state.buffers:
                v["buffers"] = state.buffers
            logits = model.apply(v, x, train=True, rngs={"dropout": rng})
            return dice_ce_loss(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    # Python-level chain of dispatches of ONE compiled step: wrapping the
    # chain in lax.scan makes XLA compile the loop body differently from the
    # executable a real training loop runs (see bench.py).  The state carries
    # the data dependency; the final loss fetch forces execution.
    step_fn = jax.jit(one_step)

    def chain(k):
        s, loss = state, None
        for i in range(k):
            s, loss = step_fn(s, jax.random.fold_in(jax.random.key(3), i))
        return float(loss)

    print("compiling...", flush=True)
    chain(1)

    def t(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            chain(k)
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo, k_hi = 1, 1 + args.k
    per_step = (t(k_hi) - t(k_lo)) / (k_hi - k_lo)
    print(
        json.dumps(
            {
                "metric": f"{args.model}_train_step",
                "remat": args.remat,
                "spatial": args.spatial,
                "batch": args.batch,
                "dtype": args.dtype,
                "value": round(per_step, 4),
                "unit": "sec/step",
                "steps_per_sec": round(1.0 / per_step, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
