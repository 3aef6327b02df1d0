"""Sliding-window inference with gaussian blending.

TPU-native equivalent of MONAI's ``SlidingWindowInfererAdapt``
(reference: model_zoo/factorizer_brats23/configs/train.yaml:206-212: roi
128^3, overlap 0.5, gaussian mode).  Window positions are computed statically
from the (padded) volume shape, so the per-window predictor compiles exactly
once; windows are batched into fixed-size groups (the last group is padded)
to avoid any recompilation, and accumulation happens on device.
"""

from __future__ import annotations

import itertools
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["compute_importance_map", "sliding_window_positions", "sliding_window_inference"]


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


def sliding_window_inference(
    inputs: Array,
    roi_size: Sequence[int],
    predictor: Callable[[Array], Array],
    sw_batch_size: int = 4,
    overlap: float = 0.5,
    mode: str = "gaussian",
    out_channels: Optional[int] = None,
    pad_value: float = 0.0,
) -> Array:
    """Run ``predictor`` over overlapping windows and blend the results.

    Args:
        inputs: ``(B, C, *S)`` channels-first volume batch.
        roi_size: spatial window size fed to the predictor.
        predictor: ``(n, C, *roi) -> (n, C_out, *roi)``.  All calls use
            identical shapes, so a caller-jitted predictor compiles once.
            Close over model weights via a traced argument (e.g.
            ``lambda w: jitted(variables, w)``), NOT as literals.
        sw_batch_size: number of windows evaluated per predictor call.
        overlap: fractional window overlap.
        mode: ``"gaussian"`` or ``"constant"`` blending.

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

    # Gather all (sample, window) jobs.
    jobs = [(b, pos) for b in range(batch) for pos in positions]
    n_jobs = len(jobs)
    n_groups = int(math.ceil(n_jobs / sw_batch_size))

    out_sum = None
    weight_sum = jnp.zeros((batch, 1, *pspatial), jnp.float32)

    for g in range(n_groups):
        group = jobs[g * sw_batch_size : (g + 1) * sw_batch_size]
        pad_n = sw_batch_size - len(group)
        group_padded = group + [group[-1]] * pad_n

        windows = jnp.stack(
            [
                jax.lax.dynamic_slice(
                    padded[b], (0, *pos), (padded.shape[1], *roi)
                )
                for b, pos in group_padded
            ]
        )
        preds = predictor(windows).astype(jnp.float32)

        if out_sum is None:
            out_sum = jnp.zeros((batch, preds.shape[1], *pspatial), jnp.float32)

        for j, (b, pos) in enumerate(group):
            w = importance[None]
            contrib = preds[j] * w
            out_sum = out_sum.at[(b, slice(None), *[slice(s, s + r) for s, r in zip(pos, roi)])].add(
                contrib
            )
            weight_sum = weight_sum.at[
                (b, slice(None), *[slice(s, s + r) for s, r in zip(pos, roi)])
            ].add(w)

    result = out_sum / jnp.maximum(weight_sum, 1e-8)
    # Crop padding back off.
    slices = (slice(None), slice(None)) + tuple(slice(0, s) for s in spatial)
    return result[slices]
