#!/usr/bin/env python
"""ISLES22 operating-point profiling (the last bundle family without chip
numbers).

All five ISLES22 bundles train at 64^3 ROI, batch 8, 2 input modalities
(DWI+ADC), 1 output channel (reference:
model_zoo/*_isles22/configs/train.yaml roi_size/batch_size).  Forwards
for every family, full train step (fwd + DiceCE + bwd + AdamW) for the
two flagship families.  Records under ``profiler.json::isles22_3d``.

    python tools/profile_isles.py [--dtype bfloat16] [--update]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

import jax
import jax.numpy as jnp

from factorizer_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

from profile_2d import measure_forward, measure_train  # noqa: E402

SPATIAL, BATCH, IN_CH, OUT_CH = 64, 8, 2, 1


def build_models(dtype):
    import factorizer_tpu as ftx

    common = dict(in_channels=IN_CH, out_channels=OUT_CH, dtype=dtype)
    return {
        # zoo/factorizer_isles22 network_def
        "factorizer_isles22": ftx.Factorizer(
            spatial_size=(SPATIAL,) * 3, encoder_depth=(1,) * 5,
            encoder_width=(32, 64, 128, 256, 512), strides=(1, 2, 2, 2, 2),
            decoder_depth=(1,) * 4, norm=ftx.LayerNorm,
            reshape=(ftx.SWMatricize,
                     {"head_dim": 8, "patch_size": 4, "shifts": [None, 1, 2, 3]}),
            act="relu", factorize=ftx.NMF, rank=1, num_iters=5,
            init_method="uniform", solver="hals", mlp_ratio=4, **common,
        ),
        # zoo/deconver_isles22 network_def
        "deconver_isles22": ftx.Deconver(
            spatial_dims=3, encoder_depth=(1,) * 5,
            encoder_width=(32, 64, 128, 256, 512), strides=(1, 2, 2, 2, 2),
            decoder_depth=(1,) * 4, norm=ftx.InstanceNorm, act="relu",
            groups=-1, ratio=1, kernel_size=(3, 3, 3), num_iters=1,
            mlp_ratio=4, **common,
        ),
        # zoo/nnunet_isles22 network_def
        "nnunet_isles22": ftx.DynUNet(
            spatial_dims=3, kernel_size=(3,) * 5, strides=(1, 2, 2, 2, 2),
            filters=(32, 64, 128, 256, 512), **common,
        ),
        # zoo/segresnet_isles22 network_def
        "segresnet_isles22": ftx.SegResNet(init_filters=32, **common),
        # zoo/swinunetr_isles22 network_def
        "swinunetr_isles22": ftx.SwinUNETR(
            img_size=(SPATIAL,) * 3, feature_size=24, window_size=7,
            use_v2=False, **common,
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", default="factorizer_isles22,deconver_isles22",
                    help="comma list of models to also train-step profile")
    ap.add_argument("--update", action="store_true", help="record in profiler.json")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    models = build_models(dtype)
    x1 = jax.random.uniform(jax.random.key(1), (1, IN_CH, *(SPATIAL,) * 3), jnp.float32)

    out = {
        "input_shape": [1, IN_CH, SPATIAL, SPATIAL, SPATIAL],
        "train_batch": BATCH,
        "dtype": args.dtype,
        "models": {},
    }
    train_set = set(filter(None, args.train.split(",")))
    for name, model in models.items():
        print(f"profiling {name} (forward 1x{SPATIAL}^3)...", flush=True)
        try:
            rec = measure_forward(model, x1)
        except Exception as e:
            out["models"][name] = {"error": repr(e)[:300]}
            print(f"  FAILED: {e!r}", flush=True)
            continue
        if name in train_set:
            print(f"  train step b{BATCH}...", flush=True)
            try:
                rec.update(measure_train(
                    model, BATCH, SPATIAL, in_ch=IN_CH, out_ch=OUT_CH, dims=3,
                ))
                rec["vol_per_s"] = round(BATCH / rec["train_step_s"], 2)
            except Exception as e:
                rec["train_error"] = repr(e)[:300]
                print(f"  train FAILED: {e!r}", flush=True)
        out["models"][name] = rec
        print(f"  {rec}", flush=True)

    print(json.dumps(out))
    if args.update:
        prof_path = _REPO / "profiler.json"
        prof = json.loads(prof_path.read_text()) if prof_path.exists() else {}
        prev = prof.get("isles22_3d", {})
        if prev.get("input_shape") == out["input_shape"]:
            out["models"] = {**prev.get("models", {}), **out["models"]}
        prof["isles22_3d"] = out
        prof_path.write_text(json.dumps(prof, indent=1))
        print(f"recorded under 'isles22_3d' in {prof_path}")


if __name__ == "__main__":
    main()
