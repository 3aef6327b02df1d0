"""Metric handlers for this bundle (reference: model_zoo/*/scripts/metrics.py)."""

from factorizer_tpu.train.metrics import (  # noqa: F401
    MeanDice,
    MeanHausdorffDistance,
    dice_metric,
    hausdorff_distance_95,
)
