"""Segmentation losses.

TPU-native equivalent of the bundle loss config — MONAI ``DiceCELoss`` with
``sigmoid=True, squared_pred=True`` (reference:
model_zoo/factorizer_brats23/configs/train.yaml:67-70).  Pure jnp; fuses into
the train step under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["dice_loss", "bce_with_logits", "dice_ce_loss", "deep_supervision_loss"]


def dice_loss(
    logits: Array,
    targets: Array,
    sigmoid: bool = True,
    squared_pred: bool = True,
    include_background: bool = True,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    channel_axis: int = 1,
) -> Array:
    """Soft Dice loss, matching MONAI's formulation.

    Args:
        logits: ``(B, C, *S)`` raw predictions (``channel_axis`` selects C).
        targets: same shape, {0, 1} one-hot-per-channel masks.

    Returns:
        Scalar mean Dice loss over batch and channels.
    """
    # Loss math is pinned to >= f32 regardless of the network compute dtype
    # (amp): reducing bf16 probabilities over 128^3 voxels loses the sum in
    # the 8-bit mantissa.  Matches torch.autocast, which computes losses f32.
    # f64 inputs (x64 parity runs) keep f64 rather than truncating.
    dt = jnp.promote_types(logits.dtype, jnp.float32)
    logits = logits.astype(dt)
    targets = targets.astype(dt)
    probs = jax.nn.sigmoid(logits) if sigmoid else logits
    if not include_background:
        probs = jnp.take(probs, jnp.arange(1, probs.shape[channel_axis]), axis=channel_axis)
        targets = jnp.take(targets, jnp.arange(1, targets.shape[channel_axis]), axis=channel_axis)

    reduce_axes = tuple(i for i in range(probs.ndim) if i not in (0, channel_axis % probs.ndim))
    intersection = jnp.sum(targets * probs, axis=reduce_axes)
    if squared_pred:
        ground = jnp.sum(targets**2, axis=reduce_axes)
        pred = jnp.sum(probs**2, axis=reduce_axes)
    else:
        ground = jnp.sum(targets, axis=reduce_axes)
        pred = jnp.sum(probs, axis=reduce_axes)

    dice = (2.0 * intersection + smooth_nr) / (ground + pred + smooth_dr)
    return jnp.mean(1.0 - dice)


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """Numerically stable binary cross-entropy with logits (mean reduction)."""
    dt = jnp.promote_types(logits.dtype, jnp.float32)  # >= f32 (see dice_loss)
    logits = logits.astype(dt)
    targets = targets.astype(dt)
    # log(1 + exp(-|x|)) + max(x, 0) - x*t
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def dice_ce_loss(
    logits: Array,
    targets: Array,
    sigmoid: bool = True,
    squared_pred: bool = True,
    include_background: bool = True,
    lambda_dice: float = 1.0,
    lambda_ce: float = 1.0,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
) -> Array:
    """Dice + (binary) cross-entropy, the bundles' training loss."""
    d = dice_loss(
        logits,
        targets,
        sigmoid=sigmoid,
        squared_pred=squared_pred,
        include_background=include_background,
        smooth_nr=smooth_nr,
        smooth_dr=smooth_dr,
    )
    ce = bce_with_logits(logits, targets)
    return lambda_dice * d + lambda_ce * ce


def deep_supervision_loss(
    logits_pyramid: Sequence[Array],
    targets: Array,
    weights: Optional[Sequence[float]] = None,
    **kwargs,
) -> Array:
    """Weighted multi-scale loss over deep-supervision heads.

    Targets are average-pooled to each head's resolution; default weights
    halve per level and are normalized to sum to 1.
    """
    n = len(logits_pyramid)
    if weights is None:
        weights = [0.5**j for j in range(n)]
    wsum = sum(weights)

    total = 0.0
    for j, logits in enumerate(logits_pyramid):
        t = targets
        if logits.shape != targets.shape:
            factors = tuple(ts // ls for ts, ls in zip(targets.shape[2:], logits.shape[2:]))
            window = (1, 1, *factors)
            t = jax.lax.reduce_window(targets, 0.0, jax.lax.add, window, window, "VALID")
            t = t / jnp.prod(jnp.array(factors))
        total = total + weights[j] * dice_ce_loss(logits, t, **kwargs)
    return total / wsum
