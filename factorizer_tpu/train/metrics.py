"""Segmentation metrics: Dice and 95th-percentile Hausdorff distance.

TPU-native equivalents of the bundle metric handlers (reference:
model_zoo/factorizer_brats23/scripts/metrics.py:7-45 wrapping
monai.metrics.{DiceMetric,HausdorffDistanceMetric}).  Dice is pure jnp
(device-side); HD95 runs on host via scipy distance transforms, as surface
distances are inherently data-dependent.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import Array

try:
    from scipy import ndimage as _ndi
except ImportError:  # pragma: no cover
    _ndi = None

__all__ = [
    "dice_metric",
    "MeanDice",
    "hausdorff_distance_95",
    "MeanHausdorffDistance",
    "voxel_spacing_from_meta",
]


def voxel_spacing_from_meta(meta) -> Optional[tuple]:
    """Voxel spacing (mm per voxel) from an image meta dict's affine.

    The transform pipeline keeps ``<key>_meta["affine"]`` current through
    Spacingd/Orientationd/Invertd, so the column norms of its rotation block
    are the spacing of whatever grid the arrays are on right now — 1 mm after
    a 1 mm Spacingd, native after Invertd.  Returns None when no usable
    affine is present (e.g. raster 2-D images with identity affines still
    return (1,1,1), which is correct).
    """
    if not isinstance(meta, dict):
        return None
    aff = meta.get("affine")
    if aff is None:
        return None
    aff = np.asarray(aff, dtype=np.float64)
    if aff.ndim != 2 or aff.shape[0] < 2:
        return None
    n = aff.shape[0] - 1
    return tuple(np.sqrt((aff[:n, :n] ** 2).sum(axis=0)))


def dice_metric(
    pred: Array,
    target: Array,
    include_background: bool = True,
    ignore_empty: bool = False,
    channel_axis: int = 1,
) -> Array:
    """Per-sample, per-channel hard Dice on binarized masks.

    Args:
        pred/target: ``(B, C, *S)`` binary masks.
        ignore_empty: MONAI ``DiceMetric`` semantics.  ``True``: NaN where the
            ground truth is empty (excluded from the mean downstream).
            ``False`` (the reference bundles' setting,
            e.g. train.yaml ``ignore_empty: false``): an empty ground-truth
            channel scores 1.0 if the prediction is also empty, else 0.0.

    Returns:
        ``(B, C)`` Dice scores.
    """
    # Host masks stay on the host: uploading two full volumes to the device
    # just to sum them costs seconds over a TPU tunnel.  The same expression
    # graph runs under either namespace.
    xp = np if isinstance(pred, np.ndarray) and isinstance(target, np.ndarray) else jnp
    if not include_background:
        pred = xp.take(pred, xp.arange(1, pred.shape[channel_axis]), axis=channel_axis)
        target = xp.take(target, xp.arange(1, target.shape[channel_axis]), axis=channel_axis)

    axes = tuple(range(2, pred.ndim))
    intersection = xp.sum(pred * target, axis=axes, dtype=xp.float64 if xp is np else None)
    pred_o = xp.sum(pred, axis=axes, dtype=xp.float64 if xp is np else None)
    target_o = xp.sum(target, axis=axes, dtype=xp.float64 if xp is np else None)
    denom = pred_o + target_o
    dice = (2.0 * intersection) / xp.maximum(denom, 1e-12)
    if ignore_empty:
        dice = xp.where(target_o > 0, dice, xp.nan)
    else:
        empty_gt_score = xp.where(pred_o > 0, 0.0, 1.0)
        dice = xp.where(target_o > 0, dice, empty_gt_score)
    return dice


class MeanDice:
    """Accumulating mean-Dice (NaN-aware), ignite-handler analogue.

    Defaults to ``ignore_empty=False`` to match the bundle metric config
    (MONAI DiceMetric scores both-empty channels as 1.0).
    """

    def __init__(self, include_background: bool = True, ignore_empty: bool = False) -> None:
        self.include_background = include_background
        self.ignore_empty = ignore_empty
        self.reset()

    def reset(self) -> None:
        self._scores: list[np.ndarray] = []

    def update(self, pred: Array, target: Array) -> None:
        d = dice_metric(
            pred,
            target,
            include_background=self.include_background,
            ignore_empty=self.ignore_empty,
        )
        self._scores.append(np.asarray(d))

    def compute(self) -> float:
        if not self._scores:
            return float("nan")
        allv = np.concatenate(self._scores, axis=0)
        return float(np.nanmean(allv))

    def compute_per_channel(self) -> np.ndarray:
        if not self._scores:
            return np.asarray([], dtype=np.float64)
        allv = np.concatenate(self._scores, axis=0)
        return np.nanmean(allv, axis=0)


def _surface_points(mask: np.ndarray) -> np.ndarray:
    """Boolean surface (border) voxels of a binary mask."""
    eroded = _ndi.binary_erosion(mask, iterations=1, border_value=0)
    return mask & ~eroded


def hausdorff_distance_95(
    pred: np.ndarray,
    target: np.ndarray,
    percentile: float = 95.0,
    spacing: Optional[tuple] = None,
) -> float:
    """Symmetric percentile Hausdorff distance between two binary masks.

    Host-side (numpy/scipy).  Returns NaN if either mask is empty, matching
    MONAI's behavior.
    """
    if _ndi is None:
        raise ImportError("scipy is required for Hausdorff distance")
    pred = np.asarray(pred).astype(bool)
    target = np.asarray(target).astype(bool)
    if not pred.any() or not target.any():
        return float("nan")

    sp = _surface_points(pred)
    st = _surface_points(target)
    # Meta affines are homogeneous (often 4x4 even for 2-D rasters); keep the
    # leading ndim entries so the EDT sampling always matches the mask rank.
    sampling = (
        tuple(spacing)[: pred.ndim] if spacing is not None else (1.0,) * pred.ndim
    )
    if len(sampling) != pred.ndim:
        raise ValueError(
            f"spacing has {len(sampling)} entries for a {pred.ndim}-D mask"
        )

    # Distance from each surface to the other mask's surface.
    dt_t = _ndi.distance_transform_edt(~st, sampling=sampling)
    dt_p = _ndi.distance_transform_edt(~sp, sampling=sampling)
    d_pt = dt_t[sp]
    d_tp = dt_p[st]
    return float(
        max(np.percentile(d_pt, percentile), np.percentile(d_tp, percentile))
    )


class MeanHausdorffDistance:
    """Accumulating mean HD95 over samples and channels (NaN-aware)."""

    def __init__(self, percentile: float = 95.0, include_background: bool = True) -> None:
        self.percentile = percentile
        self.include_background = include_background
        self.reset()

    def reset(self) -> None:
        self._scores: list[float] = []

    def update(self, pred, target, spacing: Optional[tuple] = None) -> None:
        """Accumulate HD95 per sample/channel.

        ``spacing`` is the voxel spacing (mm per voxel, one value per spatial
        dim) of the grid the masks live on; surface distances are then in mm
        rather than voxels — matching MONAI's HausdorffDistanceMetric when it
        receives spatially-calibrated meta (reference:
        model_zoo/factorizer_brats23/scripts/metrics.py:25-45).
        """
        pred = np.asarray(pred)
        target = np.asarray(target)
        c0 = 0 if self.include_background else 1
        for b in range(pred.shape[0]):
            for c in range(c0, pred.shape[1]):
                self._scores.append(
                    hausdorff_distance_95(
                        pred[b, c], target[b, c], self.percentile, spacing=spacing
                    )
                )

    def compute(self) -> float:
        if not self._scores:
            return float("nan")
        arr = np.asarray(self._scores, dtype=np.float64)
        if not np.isfinite(arr).any():  # all masks empty: HD undefined
            return float("nan")
        return float(np.nanmean(arr))
