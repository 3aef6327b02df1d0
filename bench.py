"""End-to-end benchmark: flagship Swin-Factorizer forward at (1, 2, 128^3).

Prints ONE JSON line.  Primary fields {"metric", "value", "unit",
"vs_baseline"} are the forward throughput vs the reference's only in-repo
latency (torch CPU).  Additional fields make the BASELINE.json north star
(">=4x A100 128^3 throughput per chip") decidable from the artifact itself:

- ``train_step_s`` / ``train_vol_per_s``: full train step (fwd + DiceCE +
  bwd + AdamW) at the bundle operating point (batch 2, bf16).
- ``bytes_per_forward_gb`` + ``hbm_roofline_frac``: XLA cost-analysis bytes
  and the achieved fraction of this chip's HBM roofline — the model is
  bandwidth-bound, so this is the "speed-of-light" statement.
- ``a100_anchor_vol_per_s`` + ``vs_a100`` + ``vs_a100_v5p_projected``: the
  derived A100 anchor for the reference-as-shipped (see PERFORMANCE.md
  "A100 anchor" for the full derivation) and our multiple of it, measured
  on this chip and bandwidth-projected to the v5p named in BASELINE.json.

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
by that reference throughput.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from factorizer_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

REFERENCE_CPU_LATENCY_S = 16.19  # tests/profiler.json, Factorizer @ (1,2,128^3)

# ---- A100 anchor (derivation: PERFORMANCE.md "A100 anchor") ----------------
# The reference-as-shipped is eager PyTorch (no compile/fusion, amp: false).
# Its per-forward HBM traffic is proxied by this repo's round-1 faithful
# unfused XLA translation of the same op chain: 223 GB (profiler.json history,
# PERFORMANCE.md round-2 notes).  At A100-SXM bandwidth 1.555 TB/s and zero
# launch gaps (generous), that bounds the reference forward at:
A100_HBM_BYTES_PER_S = 1.555e12
A100_ANCHOR_TRAFFIC_GB = 223.0
A100_ANCHOR_VOL_PER_S = A100_HBM_BYTES_PER_S / (A100_ANCHOR_TRAFFIC_GB * 1e9)  # ~7.0

# HBM bandwidths for the roofline fraction / cross-chip projection.
CHIP_HBM_BYTES_PER_S = {"v5e": 0.82e12, "v5p": 2.765e12, "v4": 1.23e12}
THIS_CHIP = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")


def _make_step(model, variables):
    """One compiled forward returning a scalar (the chain coupling value)."""

    @jax.jit
    def step(variables, x):
        y = model.apply(variables, x)
        return jnp.mean(y.astype(jnp.float32))

    return (lambda x: step(variables, x)), step


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


def _forward_bytes(step_jit, variables, x) -> float:
    """XLA cost-analysis bytes for the SAME compiled step used for timing
    (the scalar mean adds negligible bytes; reusing it avoids a second
    flagship compile)."""
    try:
        cost = step_jit.lower(variables, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("bytes accessed", float("nan")))
    except Exception:
        return float("nan")


def _train_step_time(dtype, model=None) -> tuple:
    """Full train step (fwd + DiceCE + bwd + AdamW), flagship, batch 2.

    Returns ``(seconds_per_step, bytes_accessed)`` — the cost-analysis bytes
    of the SAME compiled step that is timed, so the train-step roofline
    fraction is derived from the executable users run.  ``model`` overrides
    the default flagship Factorizer (e.g. the Deconver operating point in
    tools/flagship_gate.py)."""
    import optax

    import factorizer_tpu as ftx
    from factorizer_tpu.train.losses import dice_ce_loss
    from factorizer_tpu.train.trainer import TrainState, init_opt_state

    # the BraTS bundle operating point: 4 -> 3 channels, batch 2
    if model is None:
        model = ftx.Factorizer(
            in_channels=4, out_channels=3, spatial_size=(128,) * 3,
            encoder_depth=(1,) * 5, encoder_width=(32, 64, 128, 256, 512),
            strides=(1, 2, 2, 2, 2), decoder_depth=(1,) * 4,
            reshape=(ftx.SWMatricize, {"head_dim": 8, "patch_size": 8}),
            rank=1, num_iters=5, init_method="uniform", solver="hals",
            mlp_ratio=4, dtype=dtype,
        )
    x = jax.random.uniform(jax.random.key(0), (2, 4, 128, 128, 128), jnp.float32)
    y = (jax.random.uniform(jax.random.key(1), (2, 3, 128, 128, 128)) > 0.5).astype(
        jnp.float32
    )
    variables = jax.jit(model.init)(jax.random.key(2), x)
    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=init_opt_state(tx, variables["params"], flat=True), tx=tx,
        flat_opt=True,
    )

    # images/labels are ARGUMENTS (as in the real trainer), not jit-captured
    # constants: captured batches let XLA constant-fold shifted input slices
    # into literals, which the production step never sees.
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

    chain(1)  # compile

    try:
        cost = (
            one_step.lower(state, x, y, jax.random.key(3)).compile().cost_analysis()
        )
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_bytes = float(cost.get("bytes accessed", float("nan")))
    except Exception:
        step_bytes = float("nan")

    def t(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            chain(k)
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(5) - t(1)) / 4, step_bytes


def main() -> None:
    t_start = time.perf_counter()
    from __graft_entry__ import _flagship

    # bf16 activations are the TPU-native serving configuration (solver math
    # stays float32 inside the fused kernel); set FTX_BENCH_DTYPE=float32 for
    # the full-precision variant.
    dtype_name = os.environ.get("FTX_BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None
    model = _flagship(dtype=dtype)
    x = jax.random.uniform(jax.random.key(1), (1, 2, 128, 128, 128), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)

    k_lo, k_hi = 2, 10
    step, step_jit = _make_step(model, variables)
    _chained(step, x, 2)  # compile

    t_lo = _time(step, x, k_lo)
    t_hi = _time(step, x, k_hi)
    per_iter = (t_hi - t_lo) / (k_hi - k_lo)

    vol_per_s = 1.0 / per_iter
    baseline_vol_per_s = 1.0 / REFERENCE_CPU_LATENCY_S

    bw = CHIP_HBM_BYTES_PER_S.get(THIS_CHIP, CHIP_HBM_BYTES_PER_S["v5e"])
    fwd_bytes = _forward_bytes(step_jit, variables, x)
    roofline_s = fwd_bytes / bw if fwd_bytes == fwd_bytes else float("nan")
    roofline_frac = roofline_s / per_iter if roofline_s == roofline_s else float("nan")

    # The train-step measurement needs its own (cached) compile; skip it when
    # the forward phase already ran long (cold cache / contended host) so the
    # primary metric always lands within the driver's budget.
    train_s = train_bytes = float("nan")
    if (
        os.environ.get("FTX_BENCH_TRAIN", "1") != "0"
        and time.perf_counter() - t_start < float(os.environ.get("FTX_BENCH_TRAIN_DEADLINE_S", 420))
    ):
        try:
            train_s, train_bytes = _train_step_time(dtype)
        except Exception as e:  # keep the primary metric alive, but say why
            import sys, traceback

            print(f"train-step measurement failed: {e!r}", file=sys.stderr)
            traceback.print_exc()

    # Sustained end-to-end training: the composed loop (real bundle loader ->
    # _device_batch -> dispatch) at the flagship operating point, CacheDataset
    # steady state.  On this tunneled 1-core host the number is host/transfer
    # bound; the projection fields separate the environment artifact (see
    # tools/bench_sustained.py and PERFORMANCE.md "Sustained training").
    sustained: dict = {}
    if (
        os.environ.get("FTX_BENCH_SUSTAINED", "1") != "0"
        and train_s == train_s  # train-step phase ran (shares its compile)
        and time.perf_counter() - t_start
        < float(os.environ.get("FTX_BENCH_SUSTAINED_DEADLINE_S", 600))
    ):
        try:
            import sys as _sys
            from pathlib import Path as _Path

            _sys.path.insert(0, str(_Path(__file__).resolve().parent / "tools"))
            from bench_sustained import measure as _sustained_measure

            res = _sustained_measure(
                cases=6, steps=24, batch=2, dtype_name=dtype_name, workers=0,
                data_root="/tmp/ftx_sustained_cases", quick=True,
            )
            sustained = {
                "sustained_train_vol_per_s": res["warm"]["vol_per_s"],
                "sustained_step_s": res["warm"]["step_s"],
                "sustained_phases": {
                    k: round(res["warm"][k] / res["warm"]["steps"], 3)
                    for k in ("loader_wait_s", "upload_s", "dispatch_s")
                },
                "sustained_projected_tpu_vm_vol_per_s": res["projection_tpu_vm"][
                    "sustained_vol_per_s"
                ],
                "sustained_projected_bound": res["projection_tpu_vm"]["bound"],
            }
        except Exception as e:
            import sys, traceback

            print(f"sustained measurement failed: {e!r}", file=sys.stderr)
            traceback.print_exc()

    vs_a100 = vol_per_s / A100_ANCHOR_VOL_PER_S
    v5p_projected = vol_per_s * CHIP_HBM_BYTES_PER_S["v5p"] / bw

    out = {
        "metric": "factorizer_128cube_forward_throughput",
        "value": round(vol_per_s, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vol_per_s / baseline_vol_per_s, 2),
        "chip": THIS_CHIP,
        "bytes_per_forward_gb": round(fwd_bytes / 1e9, 1) if fwd_bytes == fwd_bytes else None,
        "hbm_roofline_frac": round(roofline_frac, 3) if roofline_frac == roofline_frac else None,
        "train_step_s_b2": round(train_s, 4) if train_s == train_s else None,
        "train_vol_per_s": round(2.0 / train_s, 2) if train_s == train_s else None,
        "bytes_per_train_step_gb": (
            round(train_bytes / 1e9, 1) if train_bytes == train_bytes else None
        ),
        "train_hbm_roofline_frac": (
            round((train_bytes / bw) / train_s, 3)
            if train_bytes == train_bytes and train_s == train_s
            else None
        ),
        "a100_anchor_vol_per_s": round(A100_ANCHOR_VOL_PER_S, 2),
        "vs_a100": round(vs_a100, 2),
        "vs_a100_v5p_projected": round(v5p_projected / A100_ANCHOR_VOL_PER_S, 2),
        **sustained,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
