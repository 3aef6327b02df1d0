"""Optimizer + LR schedule factories.

TPU-native equivalent of the bundles' AdamW + WarmupCosineSchedule
(reference: model_zoo/factorizer_brats23/configs/train.yaml:72-83), built on
optax.
"""

from __future__ import annotations

from typing import Optional

import optax

__all__ = ["warmup_cosine_schedule", "make_adamw"]


def warmup_cosine_schedule(
    lr: float,
    warmup_steps: int,
    total_steps: int,
    end_lr: float = 0.0,
) -> optax.Schedule:
    """Linear warmup from 0 then cosine decay to ``end_lr``."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=end_lr,
    )


def make_adamw(
    lr: float = 1e-3,
    weight_decay: float = 1e-2,
    warmup_steps: Optional[int] = None,
    total_steps: Optional[int] = None,
    grad_clip_norm: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW, optionally with warmup-cosine schedule and gradient clipping."""
    if warmup_steps is not None and total_steps is not None:
        schedule = warmup_cosine_schedule(lr, warmup_steps, total_steps)
    else:
        schedule = lr

    tx = optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx
