"""High-level training / evaluation drivers.

The workflow layer's replacement for ignite ``SupervisedTrainer`` /
``SupervisedEvaluator`` / ``EnsembleEvaluator`` + handler stack (reference:
model_zoo/factorizer_brats23/configs/train.yaml:302-384,
inference.yaml:107-161): epoch loop with compiled train step, periodic
sliding-window validation with Dice/HD95, checkpoint save/resume, console +
TensorBoard logging, and k-fold checkpoint ensembling at inference.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import process_is_primary
from .checkpoint import CheckpointManager
from .metrics import (
    MeanDice,
    MeanHausdorffDistance,
    dice_metric,
    voxel_spacing_from_meta,
)
from .schedules import make_adamw
from .sliding_window import SlidingWindowInfererAdapt, sliding_window_inference
from .trainer import TrainState, create_train_state, make_train_step

logger = logging.getLogger("factorizer_tpu")

__all__ = ["SegmentationTrainer", "Evaluator", "EnsembleEvaluator"]


def _param_count(params: Any) -> int:
    return sum(a.size for a in jax.tree.leaves(params))


class SegmentationTrainer:
    """Supervised segmentation training with periodic validation.

    Args:
        model: a flax module with ``__call__(x, train=...)``.
        train_loader / val_loader: iterables of ``{"image", "label"}`` numpy
            batches (channels-first).
        max_epochs, val_interval: loop schedule (reference defaults: 300 / 20).
        lr, weight_decay, warmup_epochs: AdamW + warmup-cosine hyperparams.
        roi_size: sliding-window size for validation.
        ckpt_dir: checkpoint directory (resumes from latest if present).
        ckpt_best: retain the ``max_to_keep`` checkpoints with the highest
            validation mean Dice instead of the latest (saves happen only on
            validated epochs); resume then restarts from the best kept step.
        loss_fn: optional override of the DiceCE default.
        mesh: optional device mesh for data-parallel training.
    """

    def __init__(
        self,
        model,
        train_loader,
        val_loader=None,
        max_epochs: int = 300,
        val_interval: int = 20,
        lr: float = 1e-3,
        weight_decay: float = 1e-2,
        warmup_epochs: int = 5,
        roi_size: Sequence[int] = (128, 128, 128),
        sw_batch_size: int = 2,
        overlap: float = 0.5,
        ckpt_dir: Optional[str] = None,
        log_dir: Optional[str] = None,
        loss_fn: Optional[Callable] = None,
        mesh=None,
        seed: int = 123,
        compute_hd95: bool = False,
        max_to_keep: int = 1,
        ckpt_best: bool = False,
        accum_steps: int = 1,
        model_axis: Optional[str] = None,
        shard_spatial: bool = False,
        tp_min_weight_size: int = 2**14,
    ) -> None:
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.max_epochs = max_epochs
        self.val_interval = val_interval
        self.roi_size = tuple(roi_size)
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.seed = seed
        self.compute_hd95 = compute_hd95
        self.mesh = mesh
        # Tensor/spatial parallelism (beyond the reference's pure DDP): with
        # ``model_axis`` set and present in the mesh, large kernels shard
        # over it (param_sharding_rules) and, with ``shard_spatial``, the
        # batch's first spatial axis does too (GSPMD halo exchanges).  The
        # flat (raveled) optimizer is incompatible with sharded params (the
        # ravel would all-gather them), so it switches off automatically.
        self._model_axis = (
            model_axis
            if mesh is not None
            and model_axis is not None
            and model_axis in mesh.axis_names
            and mesh.shape[model_axis] > 1
            else None
        )
        self._spatial_axis = self._model_axis if shard_spatial else None
        self._tp_min_weight_size = tp_min_weight_size
        # Host->device image transfer dtype: the model's compute dtype when
        # amp is on (see _device_batch / _model_input_dtype).
        self._input_dtype = _model_input_dtype(model)
        # Validation inferer with OOM degradation (reference train.yaml:206-212
        # uses SlidingWindowInfererAdapt); sticky across validations.
        self._inferer = SlidingWindowInfererAdapt(
            self.roi_size, sw_batch_size=sw_batch_size, overlap=overlap
        )

        steps_per_epoch = max(len(train_loader), 1)
        self.tx = make_adamw(
            lr=lr,
            weight_decay=weight_decay,
            warmup_steps=warmup_epochs * steps_per_epoch,
            total_steps=max_epochs * steps_per_epoch,
        )
        self.train_step = make_train_step(
            model, loss_fn=loss_fn, mesh=mesh, accum_steps=accum_steps,
            spatial_axis=self._spatial_axis,
        )

        def _apply(variables, windows):
            out = model.apply(variables, windows)
            return out[0] if isinstance(out, (list, tuple)) else out

        self._predict = jax.jit(_apply)  # compiled once; weights are traced args
        # Stable predictor identity: the sliding-window runner caches its
        # compiled executable keyed on this callable.
        self._sw_predict = lambda windows, variables: _apply(variables, windows)

        self._ckpt_best = bool(ckpt_best and val_loader is not None)
        self.ckpt = (
            CheckpointManager(
                ckpt_dir, max_to_keep=max_to_keep,
                best_metric_key="mean_dice" if self._ckpt_best else None,
            )
            if ckpt_dir
            else None
        )
        self.log_dir = Path(log_dir) if log_dir else None
        self._tb = None
        if self.log_dir and process_is_primary():
            self.log_dir.mkdir(parents=True, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir))
            except ImportError:
                pass

        self.state: Optional[TrainState] = None
        self.history: list[dict] = []
        self.best_metric = -float("inf")

    # -- lifecycle

    def initialize(self, sample_batch: Optional[dict] = None) -> TrainState:
        if sample_batch is None:
            sample_batch = next(iter(self.train_loader))
        x = jnp.asarray(sample_batch["image"])
        self.state = create_train_state(
            self.model, self.tx, x, jax.random.key(self.seed),
            train_kwargs={"train": False},
            flat_optimizer=self._model_axis is None,
        )
        if process_is_primary():
            logger.info("model parameters: %.2fM", _param_count(self.state.params) / 1e6)
        # resume
        if self.ckpt is not None and self.ckpt.latest_step() is not None:
            restored = self.ckpt.restore(template=self.state)
            self.state = self.state.replace(
                step=jnp.asarray(restored["step"]),
                params=restored["params"],
                buffers=restored["buffers"],
                opt_state=restored["opt_state"],
            )
            # Recover the best-validation watermark so the first post-resume
            # validation doesn't spuriously register as a new best.
            saved_best = self.ckpt.best_saved_metric("mean_dice")
            if saved_best is not None:
                self.best_metric = saved_best
            logger.info(
                "resumed from checkpoint step %s (best mean_dice %s)",
                int(self.state.step), saved_best,
            )
        if self.mesh is not None and (
            jax.process_count() > 1 or self._model_axis is not None
        ):
            # Place the freshly-initialized (or restored) host-local state
            # onto the global mesh: every leaf follows the param rule (TP
            # kernels shard over the model axis; everything else replicates
            # — the pure-DP case degenerates to full replication).  The
            # optimizer's momentum leaves mirror parameter shapes, so the
            # same shape-based rule co-locates them with their params.
            # Every host holds the same values (same seed / same
            # checkpoint), so each can serve its addressable shards.
            from ..parallel.sharding import param_leaf_rule, place_global

            rule = param_leaf_rule(
                self.mesh, self._model_axis,
                min_weight_size=self._tp_min_weight_size,
            )
            self.state = jax.tree.map(
                lambda a: place_global(a, rule(a)), self.state
            )
        return self.state

    def _device_batch(self, batch: dict) -> dict:
        """Host batch -> device batch (global array assembly on multi-host).

        Each host's loader sees a disjoint datalist shard, so its batch is
        the process-local block of a larger global batch.  Assemble that
        global array explicitly: passing host-local arrays straight into the
        sharded jit would treat them as replicated, and the data-axis
        constraint would then select only 1/num_hosts of each host's rows —
        silently training on half the loaded data (2-host case).

        Transfer dtypes: one-hot labels ship in the loader's integer dtype
        (uint8 from EnsureTyped — 4x fewer host->device bytes than the f32
        upcast; the loss casts to f32 on device, exactly).  Under amp the
        image ships in the model compute dtype (bf16, 2x fewer bytes) —
        bitwise identical to uploading f32, since the stem's first op casts
        activations to the compute dtype anyway.
        """
        image = np.asarray(batch["image"])
        if self._input_dtype is not None and image.dtype == np.float32:
            image = image.astype(self._input_dtype)
        label = np.asarray(batch["label"])
        if not np.issubdtype(label.dtype, np.integer):
            label = np.asarray(label, np.float32)
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import data_process_groups
            from ..parallel.sharding import input_sharding

            n_groups, _ = data_process_groups(self.mesh)

            def glob(v):
                if self._spatial_axis is None and n_groups == jax.process_count():
                    # classic DP layout: each host's rows are a contiguous
                    # block of the global batch
                    sh = NamedSharding(
                        self.mesh, P("data", *([None] * (v.ndim - 1)))
                    )
                    return jax.make_array_from_process_local_data(sh, v)
                # model/spatial axis spans processes: loader groups hold the
                # FULL global batch (data_process_groups == 1 made them load
                # identical data), each host donates its addressable shards
                assert n_groups == 1, (
                    "spatial/model sharding across hosts requires a single "
                    "loader group (data_process_groups(mesh)[0] == 1)"
                )
                sh = input_sharding(
                    self.mesh, v.ndim, "data", self._spatial_axis
                )
                return jax.make_array_from_callback(
                    v.shape, sh, lambda idx, v=v: v[idx]
                )

            return {"image": glob(image), "label": glob(label)}
        return {"image": jnp.asarray(image), "label": jnp.asarray(label)}

    def _log(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    # -- validation

    def validate(self) -> dict:
        assert self.state is not None
        variables = self.state.variables()
        if jax.process_count() > 1:
            # Validation runs independently per host on its own val shard:
            # fetch a host-local copy of the weights so the sliding-window
            # executables stay local and hosts never need to stay in jit
            # lockstep across differing val-set sizes.  TP-sharded params are
            # not fully addressable per host, so they are allgathered over
            # the mesh first; replicated params fetch directly.
            if self._model_axis is not None:
                from jax.experimental import multihost_utils

                variables = multihost_utils.process_allgather(
                    variables, tiled=True
                )
            else:
                variables = jax.device_get(variables)

        dice = MeanDice()
        hd = MeanHausdorffDistance() if self.compute_hd95 else None
        logged_images = False
        for batch in self.val_loader:
            images = _upload_image(batch["image"], self._input_dtype)
            labels = np.asarray(batch["label"])
            logits = self._inferer(
                images, self._sw_predict, predictor_args=(variables,)
            )
            preds = np.asarray(_threshold_mask(logits))
            dice.update(preds, labels)
            if hd is not None:
                metas = batch.get("image_meta")
                hd.update(
                    preds, labels,
                    spacing=voxel_spacing_from_meta(metas[0]) if metas else None,
                )
            if not logged_images and self._tb is not None:
                # TensorBoardImageHandler analogue (reference
                # train.yaml:296-300): one center-slice panel per validation.
                from .observability import log_validation_images

                log_validation_images(
                    self._tb, np.asarray(images), labels, preds,
                    step=int(self.state.step),
                )
                logged_images = True
        out = {"mean_dice": dice.compute()}
        per = dice.compute_per_channel()
        for c, v in enumerate(per):
            out[f"dice_ch{c}"] = float(v)
        if hd is not None:
            out["hd95"] = hd.compute()
        return out

    # -- main loop

    def run(self) -> TrainState:
        if self.state is None:
            self.initialize()
        state = self.state
        # Folding in the resume step keeps dropout/augmentation streams
        # moving forward after a checkpoint resume instead of replaying the
        # run's first epochs (the reference's ignite resume has the same
        # continue-not-replay behavior since torch RNG isn't checkpointed).
        rng = jax.random.fold_in(jax.random.key(self.seed + 1), int(self.state.step))

        # Resume at the epoch implied by the restored optimizer step.
        steps_per_epoch = max(len(self.train_loader), 1)
        start_epoch = int(state.step) // steps_per_epoch
        for epoch in range(start_epoch, self.max_epochs):
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(epoch)
            t0 = time.time()
            losses = []
            for batch in self.train_loader:
                rng, step_rng = jax.random.split(rng)
                state, metrics = self.train_step(
                    state, self._device_batch(batch), step_rng
                )
                losses.append(metrics["loss"])
            self.state = state
            epoch_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            dt = time.time() - t0
            if process_is_primary():
                logger.info(
                    "epoch %d/%d loss=%.4f (%.1fs)", epoch + 1, self.max_epochs, epoch_loss, dt
                )
                self._log("train/loss", epoch_loss, epoch)

            record = {"epoch": epoch, "loss": epoch_loss, "time_s": dt}

            val_metrics = None
            if (
                self.val_loader is not None
                and self.val_interval
                and (epoch + 1) % self.val_interval == 0
            ):
                val_metrics = self.validate()
                if jax.process_count() > 1:
                    # per-host loaders see disjoint datalist shards; average
                    # the metrics globally so logging, best-metric tracking,
                    # and best-checkpoint retention agree on every host
                    from jax.experimental import multihost_utils

                    val_metrics = {
                        k: float(np.nanmean(multihost_utils.process_allgather(
                            np.asarray(v, np.float64))))
                        for k, v in val_metrics.items()
                    }
                record.update(val_metrics)
                if process_is_primary():
                    logger.info("validation @ epoch %d: %s", epoch + 1, val_metrics)
                    for k, v in val_metrics.items():
                        self._log(f"val/{k}", v, epoch)
                if val_metrics["mean_dice"] > self.best_metric:
                    self.best_metric = val_metrics["mean_dice"]

            if self.ckpt is not None:
                # ALL processes call save: in a multi-host run orbax
                # coordinates the write itself (a rank-0 gate would fail on
                # non-fully-addressable sharded arrays); single-process runs
                # are unaffected.  async: the disk write overlaps the next
                # epoch (the arrays are copied to host before save()
                # returns, so donation of the state into the next step is
                # safe)
                if self._ckpt_best:
                    # best-by-metric retention: only validated epochs are
                    # candidates, and orbax keeps the max_to_keep highest
                    if val_metrics is not None:
                        self.ckpt.save(
                            epoch + 1, state,
                            metrics={"mean_dice": float(val_metrics["mean_dice"])},
                            block=False,
                        )
                else:
                    # latest-retention runs still record the validation metric
                    # alongside the step so best_metric survives a resume
                    self.ckpt.save(
                        epoch + 1, state,
                        metrics=(
                            {"mean_dice": float(val_metrics["mean_dice"])}
                            if val_metrics is not None else None
                        ),
                        block=False,
                    )

            self.history.append(record)
            if self.log_dir and process_is_primary():
                (self.log_dir / "history.jsonl").open("a").write(json.dumps(record) + "\n")

        if self.ckpt is not None:
            self.ckpt.wait()  # final epoch's save must be durable before return
        return state


# Stable per-model-config predictor closures.  The sliding-window runner
# cache is keyed on predictor identity, so two Evaluators built around the
# same model config (e.g. one evaluate_bundle call per epoch, or per k-fold
# member with shared architecture) must hand it the SAME callable or every
# call re-traces and re-loads the compiled executable.  Keyed by the flax
# module repr (a full field dump, so equal configs share and different
# configs never collide); weights stay traced arguments, so checkpoint swaps
# reuse the executable.
_PREDICTOR_CACHE: dict = {}
_PREDICTOR_CACHE_MAX = 32


def _model_input_dtype(model):
    """The host->device image transfer dtype for a model, or None.

    Under amp (model compute dtype bf16) the stem's first op casts the input
    to bf16 anyway, so casting on the host before upload is bitwise identical
    and halves the PCIe/tunnel bytes (see PERFORMANCE.md "Sustained
    training").
    """
    model_dtype = getattr(model, "dtype", None)
    if model_dtype is None:
        return None
    try:
        return np.dtype(model_dtype)
    except TypeError:
        return None


def _upload_image(images, input_dtype) -> jnp.ndarray:
    if isinstance(images, jax.Array):  # already on device: never round-trip
        return images
    arr = np.asarray(images)
    if input_dtype is not None and arr.dtype == np.float32:
        arr = arr.astype(input_dtype)
    return jnp.asarray(arr)


@jax.jit
def _threshold_mask(logits):
    """Binarize logits on the device: sigmoid(x) > 0.5 is exactly x > 0.

    Fetching the uint8 mask moves 4x fewer bytes host-ward than fetching
    float32 probabilities — the dominant cost per case over a TPU tunnel.
    """
    return (logits > 0).astype(jnp.uint8)


def _shared_predictor(model):
    key = (type(model).__module__, type(model).__qualname__, repr(model))
    fns = _PREDICTOR_CACHE.get(key)
    if fns is None:
        def _apply(variables, windows):
            out = model.apply(variables, windows)
            return out[0] if isinstance(out, (list, tuple)) else out

        fns = (jax.jit(_apply), lambda windows, variables: _apply(variables, windows))
        if len(_PREDICTOR_CACHE) >= _PREDICTOR_CACHE_MAX:
            _PREDICTOR_CACHE.pop(next(iter(_PREDICTOR_CACHE)))
        _PREDICTOR_CACHE[key] = fns
    return fns


class Evaluator:
    """Sliding-window evaluation of one checkpointed model over a loader."""

    def __init__(
        self,
        model,
        variables,
        roi_size: Sequence[int] = (128, 128, 128),
        sw_batch_size: int = 2,
        overlap: float = 0.5,
        compute_hd95: bool = True,
        postprocess: Optional[Callable] = None,
    ) -> None:
        self.model = model
        self.variables = variables
        self.roi_size = tuple(roi_size)
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.compute_hd95 = compute_hd95
        self.postprocess = postprocess
        self._input_dtype = _model_input_dtype(model)

        self._predict, self._sw_predict = _shared_predictor(model)
        self._inferer = SlidingWindowInfererAdapt(
            self.roi_size, sw_batch_size=sw_batch_size, overlap=overlap
        )

    def predict(self, images) -> jnp.ndarray:
        return self._inferer(
            _upload_image(images, self._input_dtype),
            self._sw_predict, predictor_args=(self.variables,),
        )

    def predict_mask(self, images) -> np.ndarray:
        """Sliding-window inference binarized on the device (uint8 fetch)."""
        return np.asarray(_threshold_mask(self.predict(images)))

    def run(self, loader, save_case_metrics: Optional[str] = None) -> dict:
        dice = MeanDice()
        hd = MeanHausdorffDistance() if self.compute_hd95 else None
        cases = []
        for batch in loader:
            preds = self.predict_mask(batch["image"])
            labels = np.asarray(batch["label"])
            dice.update(preds, labels)
            if hd is not None:
                metas = batch.get("image_meta")
                hd.update(
                    preds, labels,
                    spacing=voxel_spacing_from_meta(metas[0]) if metas else None,
                )
            case_dice = np.nanmean(np.asarray(dice_metric(preds, labels)))
            cases.append({"id": batch.get("id", [None])[0], "dice": float(case_dice)})
        out = {"mean_dice": dice.compute()}
        if hd is not None:
            out["hd95"] = hd.compute()
        if save_case_metrics:
            Path(save_case_metrics).parent.mkdir(parents=True, exist_ok=True)
            with open(save_case_metrics, "w") as f:
                json.dump(cases, f, indent=2)
        return out


class EnsembleEvaluator:
    """Mean-ensemble of k fold checkpoints (reference: inference.yaml:107-152)."""

    def __init__(
        self,
        model,
        variables_list: Sequence[Any],
        roi_size: Sequence[int] = (128, 128, 128),
        sw_batch_size: int = 2,
        overlap: float = 0.5,
    ) -> None:
        self.evaluators = [
            Evaluator(model, v, roi_size, sw_batch_size, overlap, compute_hd95=False)
            for v in variables_list
        ]

    def predict(self, images) -> np.ndarray:
        """Mean of per-model sigmoid probabilities."""
        probs = None
        for ev in self.evaluators:
            p = jax.nn.sigmoid(ev.predict(images))
            probs = p if probs is None else probs + p
        return np.asarray(probs / len(self.evaluators))
