"""Bundle program entry points: evaluation and ensemble inference.

The L4 glue invoked by the zoo configs (the analogue of the reference's
evaluate.yaml / inference.yaml programs: reference evaluate.yaml:11-54,
inference.yaml:107-161): checkpoint restore, sliding-window prediction,
invert-preprocessing round trip, NIfTI export, per-case metrics, and k-fold
mean ensembling with BraTS label fusion.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data import load_decathlon_datalist
from .data import transforms as T
from .train.checkpoint import restore_checkpoint
from .train.loop import Evaluator
from .train.metrics import dice_metric, hausdorff_distance_95, voxel_spacing_from_meta
from .train.sliding_window import sliding_window_inference

logger = logging.getLogger("factorizer_tpu")

__all__ = ["evaluate_bundle", "ensemble_inference", "fuse_brats_labels", "load_model_checkpoint"]


def _resolve_checkpoint_dir(ckpt_path):
    """Accept every checkpoint layout the framework produces.

    - a one-shot ``save_checkpoint`` directory (StandardCheckpointer),
    - a ``CheckpointManager`` step directory (``<step>/default`` item), or
    - a ``CheckpointManager`` ROOT (the trainer's ``ckpt_dir``): resolves to
      the latest step — so ``evaluate.sh --ckpt_path <train ckpt_dir>`` works
      directly on training output (the reference's CheckpointSaver writes a
      flat ``model.pt``; our trainer keeps orbax step dirs).
    """
    from pathlib import Path

    p = Path(ckpt_path)
    if (p / "default").is_dir():
        return p / "default"
    if p.is_dir():
        steps = sorted(
            (d for d in p.iterdir() if d.is_dir() and d.name.isdigit()),
            key=lambda d: int(d.name),
        )
        if steps:
            return _resolve_checkpoint_dir(steps[-1])
    return p


def load_model_checkpoint(model, ckpt_path, roi_size: Sequence[int]):
    """Restore a checkpoint's model variables (optimizer state is ignored)."""
    restored = restore_checkpoint(_resolve_checkpoint_dir(ckpt_path))
    variables = {"params": restored["params"]}
    if restored.get("buffers"):
        variables["buffers"] = restored["buffers"]
    return variables


def fuse_brats_labels(pred: np.ndarray) -> np.ndarray:
    """Nested-region channels (ET, TC, WT) -> BraTS label map.

    WT -> 2 (edema), TC -> 1 (NCR/NET), ET -> 3; later writes overwrite
    earlier ones on the nested masks (reference: inference.yaml:123-125).
    """
    et, tc, wt = pred[0] > 0, pred[1] > 0, pred[2] > 0
    out = np.zeros(pred.shape[1:], np.uint8)
    out[wt] = 2
    out[tc] = 1
    out[et] = 3
    return out


def _uncollate(batch: dict, i: int) -> dict:
    out = {}
    for k, v in batch.items():
        out[k] = v[i] if isinstance(v, (list, np.ndarray)) else v
    return out


def evaluate_bundle(
    model,
    ckpt_path,
    val_loader,
    roi_size: Sequence[int],
    output_dir: Optional[str] = None,
    case_metrics_path: Optional[str] = None,
    sw_batch_size: int = 2,
    overlap: float = 0.5,
    compute_hd95: bool = True,
    channel_names: Optional[Sequence[str]] = None,
) -> dict:
    """Checkpointed sliding-window evaluation with per-case metrics + NIfTI export.

    ``channel_names`` labels the prediction channels (e.g. BraTS nested
    regions ``["et", "tc", "wt"]``) so the metrics dict carries
    ``dice_<name>`` per-region means matching the reference metadata's
    eval_metrics keys (reference: configs/metadata.json:42-44).
    """
    variables = load_model_checkpoint(model, ckpt_path, roi_size)
    evaluator = Evaluator(model, variables, roi_size, sw_batch_size, overlap, compute_hd95=False)

    cases, dices, hds = [], [], []
    for batch in val_loader:
        preds = evaluator.predict_mask(batch["image"])
        labels = np.asarray(batch["label"])

        d = np.asarray(dice_metric(preds, labels))
        dices.append(d)
        case = {"dice": [float(v) for v in np.nanmean(d, axis=0)]}
        if compute_hd95:
            # HD95 in mm: the meta affine tracks the evaluation grid (1 mm
            # after Spacingd; native geometry if evaluating post-Invertd).
            metas = batch.get("image_meta")
            spacing = voxel_spacing_from_meta(metas[0]) if metas else None
            hd = [
                hausdorff_distance_95(preds[0, c], labels[0, c], spacing=spacing)
                for c in range(preds.shape[1])
            ]
            hds.append(hd)
            case["hd95"] = hd
        ids = batch.get("id")
        if ids:
            case["id"] = ids[0]
        cases.append(case)

        if output_dir is not None:
            sample = _uncollate(batch, 0)
            sample["pred"] = preds[0]
            inverted = T.Invertd(["pred"], orig_keys="image")(sample)
            if ids:  # name outputs by case id (filename bases may collide)
                inverted.setdefault("pred_meta", {})["filename"] = f"{ids[0]}.nii.gz"
            inverted = T.SaveImaged(["pred"], output_dir=output_dir)(inverted)

    metrics = {
        "mean_dice": float(np.nanmean(np.concatenate(dices, axis=0))) if dices else float("nan"),
    }
    if channel_names and dices:
        per_channel = np.nanmean(np.concatenate(dices, axis=0), axis=0)
        for name, value in zip(channel_names, per_channel):
            metrics[f"dice_{name}"] = float(value)
    if hds:
        hd_arr = np.asarray(hds, dtype=np.float64)
        # Guard the all-NaN case (every mask empty): nanmean of an empty slice
        # emits a RuntimeWarning and the metric is genuinely undefined.
        metrics["hd95"] = (
            float(np.nanmean(hd_arr)) if np.isfinite(hd_arr).any() else float("nan")
        )
    if case_metrics_path:
        Path(case_metrics_path).parent.mkdir(parents=True, exist_ok=True)
        Path(case_metrics_path).write_text(json.dumps({"cases": cases, **metrics}, indent=2))
        # MetricsSaver-style CSV reports next to the JSON (reference
        # evaluate.yaml:49-54): <metric>_raw.csv + <metric>_summary.csv.
        from .train.observability import write_metrics_reports

        details = {"mean_dice": np.concatenate(dices, axis=0)} if dices else {}
        if hds:
            details["hd95"] = np.asarray(hds, dtype=np.float64)
        case_ids = [c.get("id", f"case{i}") for i, c in enumerate(cases)]
        write_metrics_reports(
            Path(case_metrics_path).parent / "metrics", case_ids, details, metrics
        )
    logger.info("evaluation: %s", metrics)
    print(json.dumps(metrics))
    return metrics


def ensemble_inference(
    model,
    ckpt_paths: Sequence[str],
    datalist_path: str,
    data_dir: str,
    roi_size: Sequence[int],
    pix_size: Sequence[float],
    output_dir: str,
    dataset: str = "",
    section: str = "test",
    sw_batch_size: int = 2,
    overlap: float = 0.5,
    aot_compile: bool = False,
) -> list[str]:
    """k-fold mean-ensemble inference over a datalist, saving NIfTI predictions."""
    if not ckpt_paths:
        raise ValueError("No checkpoints found for ensembling.")
    variables_list = [load_model_checkpoint(model, p, roi_size) for p in ckpt_paths]

    spatial_dims = len(roi_size)
    pre = [T.LoadImaged(["image"], ensure_channel_first=True)]
    if spatial_dims == 3:
        pre += [
            T.CropForegroundd(["image"], source_key="image", margin=10),
            T.Orientationd(["image"], axcodes="RAS"),
        ]
    pre += [T.NormalizeIntensityd(["image"], nonzero=True, channel_wise=True)]
    if spatial_dims == 3:
        pre += [T.Spacingd(["image"], pixdim=pix_size, mode="bilinear")]
    pre += [T.SpatialPadd(["image"], spatial_size=roi_size)]
    preprocessing = T.Compose(pre)

    def _apply(variables, windows):
        out = model.apply(variables, windows)
        return out[0] if isinstance(out, (list, tuple)) else out

    applied = jax.jit(_apply)  # one executable shared by all fold checkpoints
    if aot_compile:
        # AOT-compile for fixed window shapes (the XLA serving analogue of
        # the reference's TensorRT overlay, inference_trt.yaml:1-5).
        in_ch = getattr(model, "in_channels")
        var_shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables_list[0]
        )
        w_shape = jax.ShapeDtypeStruct((sw_batch_size, in_ch, *roi_size), jnp.float32)
        applied = jax.jit(_apply).lower(var_shapes, w_shape).compile()

    sw_predict = lambda w, v: applied(v, w)  # noqa: E731  (stable identity)

    items = load_decathlon_datalist(datalist_path, section=section, base_dir=data_dir)
    if not items:
        items = load_decathlon_datalist(datalist_path, section="training", base_dir=data_dir)
    saved = []
    for item in items:
        d = preprocessing(dict(item))
        image = jnp.asarray(d["image"])[None]
        probs = None
        for variables in variables_list:
            logits = sliding_window_inference(
                image, roi_size, sw_predict, sw_batch_size=sw_batch_size,
                overlap=overlap, predictor_args=(variables,),
                host_loop=aot_compile,  # a Compiled executable cannot be traced
            )
            p = jax.nn.sigmoid(logits)
            probs = p if probs is None else probs + p
        probs = np.asarray(probs)[0] / len(variables_list)
        d["pred"] = (probs > 0.5).astype(np.uint8)
        d = T.Invertd(["pred"], orig_keys="image")(d)
        if dataset == "brats23":
            d["pred"] = fuse_brats_labels(d["pred"])[None]
        if "id" in item:  # name outputs by case id (filename bases may collide)
            d.setdefault("pred_meta", {})["filename"] = f"{item['id']}.nii.gz"
        d = T.SaveImaged(["pred"], output_dir=output_dir)(d)
        saved.append(d.get("pred_saved_path"))
        logger.info("saved %s", saved[-1])
    return saved
