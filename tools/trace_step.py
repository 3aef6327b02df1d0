#!/usr/bin/env python
"""Per-op device-time breakdown of a compiled step (VERDICT round 4, item 2).

Captures a ``jax.profiler`` device trace of N dispatches of the flagship
train step (or forward / Deconver variants), parses the xplane proto, and
aggregates the TPU "XLA Ops" line by HLO category and by op, normalized
per step.  This is the instrument behind PERFORMANCE.md's train-step
breakdowns (66.5 ms windowed-NMF kernels / 44.3 ms layout copies / ...).

    python tools/trace_step.py --mode train [--steps 3] [--top 30]
    python tools/trace_step.py --mode forward
    python tools/trace_step.py --mode deconver_train

Output: category rollup + top ops with per-step time, calls/step and
cost-analysis bytes/step (from the op metadata).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _stat_val(s, smeta):
    f = s.WhichOneof("value")
    v = getattr(s, f)
    if f == "ref_value":
        v = smeta[v].name
    return v


def parse_xplane(trace_dir: str, plane_filter: str = "TPU") -> dict:
    """Aggregate the device plane's XLA Ops by op and category.

    Returns {program_id: {"runs": n, "ops": {name: {...}}, "total_ps": t}}.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())

    programs: dict = {}
    for plane in xs.planes:
        if plane_filter not in plane.name:
            continue
        emeta, smeta = plane.event_metadata, plane.stat_metadata
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    name = emeta[ev.metadata_id].name
                    pid = name.rsplit("(", 1)[-1].rstrip(")")
                    rec = programs.setdefault(
                        pid, {"name": name, "runs": 0, "ops": {}, "total_ps": 0}
                    )
                    rec["runs"] += 1
                    rec["total_ps"] += ev.duration_ps
            elif line.name == "XLA Ops":
                for ev in line.events:
                    md = emeta[ev.metadata_id]
                    mstats = {smeta[s.metadata_id].name: _stat_val(s, smeta) for s in md.stats}
                    pid = str(mstats.get("program_id", "?"))
                    rec = programs.setdefault(
                        pid, {"name": "?", "runs": 0, "ops": {}, "total_ps": 0}
                    )
                    # op display name: the instruction name, before " = "
                    full = md.name
                    op_name = full.split(" = ")[0].lstrip("%")
                    o = rec["ops"].setdefault(
                        op_name,
                        {
                            "ps": 0,
                            "calls": 0,
                            "category": mstats.get("hlo_category", "?"),
                            "bytes": int(mstats.get("bytes_accessed", 0) or 0),
                        },
                    )
                    o["ps"] += ev.duration_ps
                    o["calls"] += 1
    return programs


def report(programs: dict, top: int = 30, min_runs: int = 2) -> dict:
    """Print the breakdown of the hottest program; return it as a dict."""
    best = max(
        (p for p in programs.values() if p["runs"] >= min_runs and p["ops"]),
        key=lambda p: p["total_ps"],
        default=None,
    )
    if best is None:  # fall back to any program with ops
        best = max((p for p in programs.values() if p["ops"]),
                   key=lambda p: p["total_ps"])
    runs = max(best["runs"], 1)
    print(f"program: {best['name']}  runs={runs}  "
          f"device total {best['total_ps'] / 1e9 / runs:.2f} ms/run\n")

    cats = collections.defaultdict(lambda: {"ps": 0, "calls": 0, "bytes": 0, "n_ops": 0})
    for name, o in best["ops"].items():
        c = cats[o["category"]]
        c["ps"] += o["ps"]
        c["calls"] += o["calls"]
        c["bytes"] += o["bytes"] * o["calls"]
        c["n_ops"] += 1

    print(f"{'category':<28} {'ms/run':>9} {'calls/run':>10} {'GB/run':>8}")
    cat_rows = []
    for cat, c in sorted(cats.items(), key=lambda kv: -kv[1]["ps"]):
        row = {
            "category": cat,
            "ms_per_run": round(c["ps"] / 1e9 / runs, 2),
            "calls_per_run": round(c["calls"] / runs, 1),
            "gb_per_run": round(c["bytes"] / 1e9 / runs, 2),
        }
        cat_rows.append(row)
        print(f"{cat:<28} {row['ms_per_run']:>9.2f} {row['calls_per_run']:>10.1f} "
              f"{row['gb_per_run']:>8.2f}")

    print(f"\ntop {top} ops:")
    print(f"{'op':<58} {'category':<22} {'ms/run':>8} {'x/run':>6} {'GB/run':>8}")
    op_rows = []
    for name, o in sorted(best["ops"].items(), key=lambda kv: -kv[1]["ps"])[:top]:
        row = {
            "op": name,
            "category": o["category"],
            "ms_per_run": round(o["ps"] / 1e9 / runs, 3),
            "calls_per_run": round(o["calls"] / runs, 1),
            "gb_per_run": round(o["bytes"] * o["calls"] / 1e9 / runs, 3),
        }
        op_rows.append(row)
        print(f"{name[:57]:<58} {o['category'][:21]:<22} {row['ms_per_run']:>8.3f} "
              f"{row['calls_per_run']:>6.1f} {row['gb_per_run']:>8.3f}")
    return {"ms_per_run": best["total_ps"] / 1e9 / runs, "categories": cat_rows,
            "top_ops": op_rows}


# ---- step builders ----------------------------------------------------------

def _flagship_train(dtype):
    import jax
    import jax.numpy as jnp
    import optax

    import factorizer_tpu as ftx
    from factorizer_tpu.train.losses import dice_ce_loss
    from factorizer_tpu.train.trainer import TrainState, init_opt_state

    model = ftx.Factorizer(
        in_channels=4, out_channels=3, spatial_size=(128,) * 3,
        encoder_depth=(1,) * 5, encoder_width=(32, 64, 128, 256, 512),
        strides=(1, 2, 2, 2, 2), decoder_depth=(1,) * 4,
        reshape=(ftx.SWMatricize, {"head_dim": 8, "patch_size": 8}),
        rank=1, num_iters=5, init_method="uniform", solver="hals",
        mlp_ratio=4, dtype=dtype,
    )
    return _train_closure(model, in_ch=4, out_ch=3, batch=2)


def _deconver_train(dtype):
    import jax.numpy as jnp

    import factorizer_tpu as ftx

    # the deconver_brats23 bundle's network_def (zoo/deconver_brats23)
    model = ftx.Deconver(
        in_channels=4, out_channels=3, spatial_dims=3,
        encoder_depth=(1,) * 5, encoder_width=(32, 64, 128, 256, 512),
        strides=(1, 2, 2, 2, 2), decoder_depth=(1,) * 4,
        norm=ftx.InstanceNorm, groups=-1, ratio=1, kernel_size=(3, 3, 3),
        num_iters=1, mlp_ratio=4, dtype=dtype,
    )
    return _train_closure(model, in_ch=4, out_ch=3, batch=2)


def _train_closure(model, in_ch: int, out_ch: int, batch: int):
    import jax
    import jax.numpy as jnp
    import optax

    from factorizer_tpu.train.losses import dice_ce_loss
    from factorizer_tpu.train.trainer import TrainState, init_opt_state

    x = jax.random.uniform(jax.random.key(0), (batch, in_ch, 128, 128, 128), jnp.float32)
    y = (jax.random.uniform(jax.random.key(1), (batch, out_ch, 128, 128, 128)) > 0.5).astype(jnp.float32)
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

    def run(n):
        s, loss = state, None
        for i in range(n):
            s, loss = one_step(s, x, y, jax.random.fold_in(jax.random.key(3), i))
        return float(loss)

    return run


def _flagship_forward(dtype):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model = _flagship(dtype=dtype)
    x = jax.random.uniform(jax.random.key(1), (1, 2, 128, 128, 128), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def fwd(variables, x):
        return jnp.mean(model.apply(variables, x).astype(jnp.float32))

    def run(n):
        m = fwd(variables, x)
        for _ in range(n - 1):
            m = fwd(variables, x + 1e-12 * m)
        return float(m)

    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="train",
                    choices=["train", "forward", "deconver_train"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--json", default=None, help="dump full result to this path")
    ap.add_argument("--trace_dir", default=None, help="parse an existing trace dir only")
    args = ap.parse_args()

    if args.trace_dir:
        programs = parse_xplane(args.trace_dir)
        out = report(programs, top=args.top)
    else:
        import jax
        import jax.numpy as jnp

        from factorizer_tpu.utils.jax_cache import configure_compile_cache

        configure_compile_cache()
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
        build = {
            "train": _flagship_train,
            "forward": _flagship_forward,
            "deconver_train": _deconver_train,
        }[args.mode]
        run = build(dtype)
        run(1)  # compile outside the trace
        tdir = tempfile.mkdtemp(prefix="trace_step_")
        with jax.profiler.trace(tdir):
            run(args.steps)
        programs = parse_xplane(tdir)
        out = report(programs, top=args.top)
        print(f"\ntrace dir: {tdir}")

    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
