"""Checkpoint save/restore built on Orbax.

The TPU-native replacement for the bundles' ignite Checkpoint handlers
(reference: model_zoo/factorizer_brats23/configs/train.yaml:354-374;
scripts/utils.py:10-31): saves ``{params, buffers, opt_state, step}`` with
retention, restores the latest for resume, and loads several fold
checkpoints for ensembling (inference.yaml:13,141-152).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None

__all__ = ["CheckpointManager", "save_checkpoint", "restore_checkpoint", "load_checkpoints"]


class CheckpointManager:
    """Thin orbax CheckpointManager wrapper with n-kept retention.

    ``best_metric_key`` switches retention from keep-latest to
    keep-best-by-metric (descending): saves must then pass
    ``metrics={key: value, ...}`` and orbax retains the ``max_to_keep``
    checkpoints with the highest values — the MONAI
    ``save_key_metric``-style policy on top of the reference's
    interval saver (reference: train.yaml:368-374 CheckpointSaver).
    """

    def __init__(
        self, directory: str | Path, max_to_keep: int = 1,
        best_metric_key: Optional[str] = None,
    ) -> None:
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.best_metric_key = best_metric_key
        kw = {}
        if best_metric_key is not None:
            kw = {"best_fn": lambda m: float(m[best_metric_key]), "best_mode": "max"}
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True, **kw)
        self._mgr = ocp.CheckpointManager(str(self.directory), options=options)

    def save(
        self, step: int, state: Any, metrics: Optional[dict] = None,
        block: bool = True,
    ) -> None:
        """Save a state pytree at ``step``.

        ``block=False`` returns after the device->host copy and persists in
        the background (orbax's async path), overlapping the disk write with
        the next training epoch; call :meth:`wait` (or ``close``) before
        relying on the file.  Donation-safe: the array contents are already
        on the host when this returns.
        """
        tree = _to_savable(state)
        self._mgr.save(step, args=ocp.args.StandardSave(tree), metrics=metrics)
        if metrics is not None:
            self._record_metrics(step, metrics)
        if block:
            self._mgr.wait_until_finished()

    # orbax persists per-step metrics only when a best_fn is configured
    # (checkpoint_manager.py:1512 gates on _track_best), so latest-retention
    # runs would lose them across a resume.  A tiny JSON sidecar records every
    # metric ever reported — which is also the right semantics for the
    # trainer's best-validation watermark (max over all validations seen, not
    # just over still-retained checkpoints).
    @property
    def _metrics_path(self) -> Path:
        return self.directory / "metrics.json"

    def _read_metrics_log(self) -> dict:
        try:
            return json.loads(self._metrics_path.read_text())
        except (OSError, ValueError):
            return {}

    def _record_metrics(self, step: int, metrics: dict) -> None:
        import jax

        if jax.process_index() != 0:  # one writer on the shared ckpt dir
            return
        log = self._read_metrics_log()
        log[str(step)] = {k: float(v) for k, v in metrics.items()}
        tmp = self._metrics_path.with_suffix(f".tmp{os.getpid()}")
        tmp.write_text(json.dumps(log, indent=1))
        os.replace(tmp, self._metrics_path)

    def wait(self) -> None:
        """Block until all in-flight async saves are durable on disk."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()  # an in-flight save IS the latest
        return self._mgr.latest_step()

    def best_saved_metric(self, key: str) -> Optional[float]:
        """Max of ``key`` over all retained checkpoints' saved metrics.

        Lets a resumed trainer recover its best-validation watermark instead
        of resetting to -inf and logging a spurious "new best" on the first
        post-resume validation.  Returns None when no retained step carries
        the metric (e.g. latest-retention runs saved before any validation).
        """
        self._mgr.wait_until_finished()
        best: Optional[float] = None
        for m in self._read_metrics_log().values():
            if key in m:
                v = float(m[key])
                best = v if best is None else max(best, v)
        return best

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(_to_savable(template))
            )
        return self._mgr.restore(step)

    def close(self) -> None:
        self._mgr.close()


def _to_savable(state: Any) -> dict:
    """TrainState -> plain dict (tx is static and excluded)."""
    if hasattr(state, "params"):
        return {
            "step": state.step,
            "params": state.params,
            "buffers": state.buffers,
            "opt_state": state.opt_state,
        }
    return state


def save_checkpoint(path: str | Path, state: Any) -> None:
    """One-shot save of a state/variables pytree."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), _to_savable(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str | Path, template: Any = None) -> Any:
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(str(path), target=_to_savable(template))
    return ckptr.restore(str(path))


def load_checkpoints(paths: list[str | Path], template: Any = None) -> list[Any]:
    """Load several (k-fold) checkpoints for ensembled inference."""
    return [restore_checkpoint(p, template) for p in paths]
