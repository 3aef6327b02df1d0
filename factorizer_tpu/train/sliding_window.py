"""Sliding-window inference with gaussian blending, compiled device-side.

TPU-native equivalent of MONAI's ``SlidingWindowInfererAdapt``
(reference: model_zoo/factorizer_brats23/configs/train.yaml:206-212: roi
128^3, overlap 0.5, gaussian mode).

Design: window start offsets are computed statically from the (padded)
volume shape, then the ENTIRE gather -> predict -> blend-accumulate loop runs
as one ``lax.scan`` over fixed-size window groups inside a single ``jax.jit``
— one compiled executable per volume shape, zero host round trips per
window.  (Round 1 drove each window from the host with eager ``.at[].add``
updates on the full output volume: O(n_windows) full-volume dispatches; on a
BraTS-native 240x240x155 volume that was the eval bottleneck.)

The predictor receives the stacked window batch plus ``predictor_args``
(typically the model variables) as traced arguments, so checkpoints can be
swapped without recompiling and weights are never baked into the executable
as constants.  Pass a *stable* ``predictor`` callable (not a fresh lambda
per call) to reuse the compiled executable across volumes.
"""

from __future__ import annotations

import itertools
import math
from collections import OrderedDict
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = [
    "compute_importance_map",
    "sliding_window_positions",
    "sliding_window_inference",
    "SlidingWindowInfererAdapt",
]


def compute_importance_map(
    roi_size: Sequence[int], mode: str = "gaussian", sigma_scale: float = 0.125
) -> np.ndarray:
    """Per-window blending weights (gaussian centered in the window)."""
    if mode == "constant":
        return np.ones(tuple(roi_size), dtype=np.float32)
    grids = []
    for s in roi_size:
        center = (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1e-3)
        x = np.arange(s, dtype=np.float64)
        grids.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    out = np.asarray(grids[0])
    for g in grids[1:]:
        out = np.multiply.outer(out, g)
    out = np.maximum(out, out.max() * 1e-3)  # avoid zero weights at corners
    return out.astype(np.float32)


def sliding_window_positions(
    image_size: Sequence[int], roi_size: Sequence[int], overlap: float = 0.5
) -> list[tuple[int, ...]]:
    """Window start offsets covering the volume (MONAI-compatible scheme)."""
    starts_per_dim = []
    for size, roi in zip(image_size, roi_size):
        if roi >= size:
            starts_per_dim.append([0])
            continue
        interval = max(int(roi * (1.0 - overlap)), 1)
        n = int(math.ceil((size - roi) / interval)) + 1
        starts = [min(i * interval, size - roi) for i in range(n)]
        # dedupe while keeping order
        starts = list(dict.fromkeys(starts))
        starts_per_dim.append(starts)
    return [tuple(p) for p in itertools.product(*starts_per_dim)]


# One compiled executable per (predictor, shapes, config).  ``groups`` is
# (n_groups, sw_batch, 1 + p) int32 of (sample, *window start); ``valid`` is
# (n_groups, sw_batch) float32 with 0 for padding jobs.
# LRU-bounded: a long-lived inference service sweeping volume shapes (every
# case shape is a distinct key) must not grow this without bound.  Evicting
# drops our reference to the jitted wrapper; XLA keeps its own compilation
# cache, so a re-miss re-traces but rarely re-compiles.
_RUNNER_CACHE: "OrderedDict[tuple, Callable]" = OrderedDict()
_RUNNER_CACHE_MAX = 32


def clear_runner_cache() -> None:
    """Drop all cached sliding-window executables (e.g. between services)."""
    _RUNNER_CACHE.clear()


def _gather_group(padded: Array, jobs: Array, roi: tuple) -> Array:
    """Stack the windows of one group: jobs (sw, 1+p) -> (sw, C, *roi)."""
    p = len(roi)
    in_ch = padded.shape[1]

    zero = jnp.zeros((), jobs.dtype)  # dtype-matched (x64 mode changes ints)

    def gather_one(job):
        start = (job[0], zero) + tuple(job[1 + i] for i in range(p))
        return jax.lax.dynamic_slice(padded, start, (1, in_ch, *roi))[0]

    return jax.vmap(gather_one)(jobs)


def _accumulate_group(out_sum, weight_sum, preds, jobs, gvalid, importance, roi: tuple):
    """Blend one group of predictions into the running sums (donated)."""
    p = len(roi)
    w = importance[None]
    zero = jnp.zeros((), jobs.dtype)
    for j in range(jobs.shape[0]):  # windows may overlap: sequential updates
        start_out = (jobs[j, 0], zero) + tuple(jobs[j, 1 + i] for i in range(p))
        contrib = preds[j].astype(jnp.float32) * (w * gvalid[j])
        cur = jax.lax.dynamic_slice(out_sum, start_out, (1, preds.shape[1], *roi))
        out_sum = jax.lax.dynamic_update_slice(out_sum, cur + contrib[None], start_out)
        wstart = (start_out[0], zero, *start_out[2:])
        curw = jax.lax.dynamic_slice(weight_sum, wstart, (1, 1, *roi))
        weight_sum = jax.lax.dynamic_update_slice(
            weight_sum, curw + (w * gvalid[j])[None], wstart
        )
    return out_sum, weight_sum


_gather_group_jit = jax.jit(_gather_group, static_argnums=(2,))
_accumulate_group_jit = jax.jit(
    _accumulate_group, static_argnums=(6,), donate_argnums=(0, 1)
)


def _get_runner(
    predictor: Callable,
    padded_shape: tuple,
    dtype,
    roi: tuple,
    n_groups: int,
    sw_batch_size: int,
    key_extra: tuple,
):
    key = (predictor, padded_shape, str(dtype), roi, n_groups, sw_batch_size, key_extra)
    fn = _RUNNER_CACHE.get(key)
    if fn is not None:
        _RUNNER_CACHE.move_to_end(key)
        return fn

    def runner(padded, groups, valid, importance, *pred_args):
        batch, in_ch = padded.shape[:2]
        pspatial = padded.shape[2:]

        def group_body(carry, grp):
            out_sum, weight_sum = carry
            jobs, gvalid = grp  # (sw, 1+p), (sw,)
            windows = _gather_group(padded, jobs, roi)
            preds = predictor(windows, *pred_args)
            out_sum, weight_sum = _accumulate_group(
                out_sum, weight_sum, preds, jobs, gvalid, importance, roi
            )
            return (out_sum, weight_sum), ()

        out_ch = jax.eval_shape(
            lambda w, *a: predictor(w, *a),
            jax.ShapeDtypeStruct((sw_batch_size, in_ch, *roi), padded.dtype),
            *pred_args,
        ).shape[1]
        out_sum = jnp.zeros((batch, out_ch, *pspatial), jnp.float32)
        weight_sum = jnp.zeros((batch, 1, *pspatial), jnp.float32)
        (out_sum, weight_sum), _ = jax.lax.scan(
            group_body, (out_sum, weight_sum), (groups, valid)
        )
        return out_sum / jnp.maximum(weight_sum, 1e-8)

    fn = jax.jit(runner)
    _RUNNER_CACHE[key] = fn
    while len(_RUNNER_CACHE) > _RUNNER_CACHE_MAX:
        _RUNNER_CACHE.popitem(last=False)
    return fn


def sliding_window_inference(
    inputs: Array,
    roi_size: Sequence[int],
    predictor: Callable[..., Array],
    sw_batch_size: int = 4,
    overlap: float = 0.5,
    mode: str = "gaussian",
    out_channels: Optional[int] = None,
    pad_value: float = 0.0,
    predictor_args: Sequence[Any] = (),
    host_loop: bool = False,
    stitch_on_host: bool = False,
) -> Array:
    """Run ``predictor`` over overlapping windows and blend the results.

    Args:
        inputs: ``(B, C, *S)`` channels-first volume batch.
        roi_size: spatial window size fed to the predictor.
        predictor: ``(n, C, *roi), *predictor_args -> (n, C_out, *roi)``.
            Pass a stable callable (defined once, not a per-call lambda) so
            the compiled executable is reused across volumes of one shape.
        sw_batch_size: number of windows evaluated per predictor call.
        overlap: fractional window overlap.
        mode: ``"gaussian"`` or ``"constant"`` blending.
        predictor_args: extra traced args for the predictor (e.g. the model
            variables) — swapping them does not recompile.
        host_loop: drive the group loop from the host instead of one fused
            ``lax.scan`` executable.  Required when ``predictor`` is an
            AOT-compiled executable (it cannot be traced); gather and
            blend-accumulate still run as compiled device functions.
        stitch_on_host: accumulate the blended output in host (numpy)
            buffers — only the padded input and one window batch live on the
            device.  The low-memory rung of the adaptive ladder
            (:class:`SlidingWindowInfererAdapt`); device memory drops from
            2 full volumes (f32 out_sum + weight_sum) to one window group.

    Returns:
        ``(B, C_out, *S)`` blended predictions.
    """
    batch, _, *spatial = inputs.shape
    roi = tuple(roi_size)
    p = len(roi)

    # Pad spatial dims up to at least roi.
    pads = [(0, 0), (0, 0)] + [(0, max(r - s, 0)) for r, s in zip(roi, spatial)]
    padded = jnp.pad(inputs, pads, constant_values=pad_value)
    pspatial = padded.shape[2:]

    positions = sliding_window_positions(pspatial, roi, overlap)
    importance = jnp.asarray(compute_importance_map(roi, mode=mode))

    # All (sample, window) jobs, grouped into fixed-size batches.
    jobs = np.asarray(
        [(b, *pos) for b in range(batch) for pos in positions], dtype=np.int32
    )
    n_jobs = len(jobs)
    n_groups = int(math.ceil(n_jobs / sw_batch_size))
    pad_n = n_groups * sw_batch_size - n_jobs
    valid = np.ones((n_jobs,), np.float32)
    if pad_n:
        jobs = np.concatenate([jobs, np.repeat(jobs[-1:], pad_n, axis=0)], axis=0)
        valid = np.concatenate([valid, np.zeros((pad_n,), np.float32)])
    groups = jnp.asarray(jobs.reshape(n_groups, sw_batch_size, 1 + p))
    gvalid = jnp.asarray(valid.reshape(n_groups, sw_batch_size))

    if stitch_on_host:
        imp_np = np.asarray(compute_importance_map(roi, mode=mode))
        jobs_np = jobs.reshape(n_groups, sw_batch_size, 1 + p)
        valid_np = valid.reshape(n_groups, sw_batch_size)
        out_sum_h = weight_sum_h = None
        for g in range(n_groups):
            windows = _gather_group_jit(padded, groups[g], roi)
            preds = np.asarray(predictor(windows, *predictor_args), np.float32)
            if out_sum_h is None:
                out_sum_h = np.zeros((batch, preds.shape[1], *pspatial), np.float32)
                weight_sum_h = np.zeros((batch, 1, *pspatial), np.float32)
            for j in range(sw_batch_size):
                if valid_np[g, j] == 0.0:
                    continue
                b0 = int(jobs_np[g, j, 0])
                win = tuple(
                    slice(int(s), int(s) + r) for s, r in zip(jobs_np[g, j, 1:], roi)
                )
                out_sum_h[(b0, slice(None), *win)] += preds[j] * imp_np
                weight_sum_h[(b0, slice(None), *win)] += imp_np
        result = jnp.asarray(out_sum_h / np.maximum(weight_sum_h, 1e-8))
    elif host_loop:
        out_sum = weight_sum = None
        for g in range(n_groups):
            windows = _gather_group_jit(padded, groups[g], roi)
            preds = predictor(windows, *predictor_args)
            if out_sum is None:
                out_sum = jnp.zeros((batch, preds.shape[1], *pspatial), jnp.float32)
                weight_sum = jnp.zeros((batch, 1, *pspatial), jnp.float32)
            out_sum, weight_sum = _accumulate_group_jit(
                out_sum, weight_sum, preds, groups[g], gvalid[g], importance, roi
            )
        result = out_sum / jnp.maximum(weight_sum, 1e-8)
    else:
        runner = _get_runner(
            predictor, padded.shape, padded.dtype, roi, n_groups, sw_batch_size, (mode,)
        )
        result = runner(padded, groups, gvalid, importance, *predictor_args)

    # Crop padding back off.
    slices = (slice(None), slice(None)) + tuple(slice(0, s) for s in spatial)
    return result[slices]


def _is_oom_error(err: BaseException) -> bool:
    msg = str(err)
    return any(
        s in msg
        for s in (
            "RESOURCE_EXHAUSTED",
            "Out of memory",
            "out of memory",
            "OOM",
            "Attempting to allocate",
            "tpu_compile_helper",  # axon tunnel surfaces compile-time HBM OOM this way
        )
    )


class SlidingWindowInfererAdapt:
    """Sliding-window inference that degrades gracefully on device OOM.

    TPU-native analogue of MONAI's ``SlidingWindowInfererAdapt`` (the
    reference's validation inferer, model_zoo/factorizer_brats23/configs/
    train.yaml:206-212): on an out-of-memory failure it steps down a ladder
    and retries —

    1. fused device executable (one ``lax.scan``, full volume resident);
    2. host-stitched accumulation (only one window group on device);
    3. host-stitched with ``sw_batch_size`` halved, repeatedly, down to 1.

    The chosen rung is sticky across calls (like MONAI's cached CPU/GPU
    decision) so a long evaluation sweep pays the failed attempts once.
    Non-OOM errors propagate unchanged.
    """

    def __init__(
        self,
        roi_size: Sequence[int],
        sw_batch_size: int = 4,
        overlap: float = 0.5,
        mode: str = "gaussian",
    ) -> None:
        self.roi_size = tuple(roi_size)
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.mode = mode
        self._stitch_on_host = False
        self._sw_batch = sw_batch_size

    def __call__(
        self,
        inputs: Array,
        predictor: Callable[..., Array],
        predictor_args: Sequence[Any] = (),
        **kw,
    ) -> Array:
        import warnings

        while True:
            try:
                return sliding_window_inference(
                    inputs,
                    self.roi_size,
                    predictor,
                    sw_batch_size=self._sw_batch,
                    overlap=self.overlap,
                    mode=self.mode,
                    predictor_args=predictor_args,
                    stitch_on_host=self._stitch_on_host,
                    **kw,
                )
            except Exception as err:  # noqa: BLE001 - filtered to OOM below
                if not _is_oom_error(err):
                    raise
                if not self._stitch_on_host:
                    self._stitch_on_host = True
                    warnings.warn(
                        "sliding-window inference hit device OOM; retrying "
                        "with host-stitched accumulation"
                    )
                elif self._sw_batch > 1:
                    self._sw_batch = max(1, self._sw_batch // 2)
                    warnings.warn(
                        "sliding-window inference hit device OOM; retrying "
                        f"with sw_batch_size={self._sw_batch}"
                    )
                else:
                    raise
