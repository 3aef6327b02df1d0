#!/usr/bin/env python
"""One-command quality-parity harness for a zoo bundle.

Chains the bundle's documented flows into a single rehearsed unit
(reference: model_zoo/*/docs/{data,train,evaluate}.sh):

    datalist -> train (or --import_ckpt model.pt) -> evaluate
             -> compare vs configs/metadata.json eval_metrics

so that "given $DATA_DIR, reproduce the metadata numbers" is one command::

    python tools/reproduce.py --bundle factorizer_brats23 --data_dir /data/brats23
    python tools/reproduce.py --bundle factorizer_brats23 --data_dir ... \
        --import_ckpt /path/to/model.pt            # skip training, import torch weights
    python tools/reproduce.py --bundle ... --train --max_epochs 500 --fold 0

Each stage shells out to the same CLI the docs/*.sh entry points use
(``python -m factorizer_tpu.bundle run``), so this rehearses the real
user-facing path, not a private one.  Exits non-zero when the measured mean
Dice falls short of the metadata target by more than ``--tolerance``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def sh(cmd: list[str], cwd: Path) -> None:
    print(f"+ {' '.join(str(c) for c in cmd)}", flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    # persistent XLA compile cache: repeated stage invocations (train,
    # evaluate) and repeated harness runs skip recompilation
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".cache" / "jax"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    subprocess.run([str(c) for c in cmd], cwd=cwd, check=True, env=env)


def ensure_datalist(bundle: Path, data_dir: str, force: bool) -> None:
    datalist = bundle / "configs" / "datalist.json"
    have = False
    if datalist.exists():
        d = json.loads(datalist.read_text())
        have = bool(d.get("training"))
    if have and not force:
        print(f"datalist: using shipped manifest ({datalist})")
        return
    sh(
        [sys.executable, "scripts/make_datalist.py", "--data_dir", data_dir,
         "--output", "configs/datalist.json"],
        cwd=bundle,
    )


def import_torch(bundle: Path, ckpt: str, fold: int) -> Path:
    """Convert a reference torch checkpoint into the bundle's models/fold{N}."""
    import torch

    from factorizer_tpu.train.checkpoint import save_checkpoint
    from factorizer_tpu.utils.torch_import import import_torch_checkpoint

    state = torch.load(ckpt, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "network"):
        if isinstance(state, dict) and key in state and not hasattr(state[key], "shape"):
            state = state[key]
    variables = import_torch_checkpoint(state)
    out = bundle / "models" / f"fold{fold}"
    # keep every collection (params + buffers: e.g. RandomInit's u0/v0 tables)
    save_checkpoint(out, dict(variables))
    print(f"imported {ckpt} -> {out}")
    return out


def evaluate(bundle: Path, fold: int, ckpt: Path | None, data_dir: str,
             overrides: list[str]) -> dict:
    out_json = bundle / "runs" / f"fold{fold}" / "case_metrics.json"
    cmd = [
        sys.executable, "-m", "factorizer_tpu.bundle", "run",
        "--config_file", "configs/train.yaml",
        "--config_file", "configs/evaluate.yaml",
        f"fold={fold}", f"data_dir={data_dir}",
    ]
    if ckpt is not None:
        cmd.append(f"ckpt_path={ckpt}")
    cmd += overrides
    sh(cmd, cwd=bundle)
    return json.loads(out_json.read_text())


def main() -> int:
    # --import_ckpt initializes JAX in-process (orbax checkpoint write);
    # honor FTX_PLATFORM here too so CI runs don't touch the TPU plugin.
    from factorizer_tpu.config.bundle import force_platform

    force_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bundle", required=True, help="zoo bundle name, e.g. factorizer_brats23")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--import_ckpt", help="torch .pt checkpoint to import instead of training")
    ap.add_argument("--train", action="store_true", help="train before evaluating")
    ap.add_argument("--max_epochs", type=int, default=None)
    ap.add_argument("--tolerance", type=float, default=0.02,
                    help="allowed mean-Dice shortfall vs metadata (default 0.02)")
    ap.add_argument("--remake_datalist", action="store_true")
    ap.add_argument("overrides", nargs="*", help="extra key=value config overrides")
    args = ap.parse_args()

    bundle = REPO / "zoo" / args.bundle
    if not bundle.is_dir():
        print(f"no such bundle: {bundle}", file=sys.stderr)
        return 2

    ensure_datalist(bundle, args.data_dir, args.remake_datalist)

    ckpt: Path | None = None
    if args.import_ckpt:
        ckpt = import_torch(bundle, args.import_ckpt, args.fold)
    elif args.train:
        cmd = [
            sys.executable, "-m", "factorizer_tpu.bundle", "run",
            "--config_file", "configs/train.yaml",
            f"fold={args.fold}", f"data_dir={args.data_dir}",
        ]
        if args.max_epochs is not None:
            cmd.append(f"max_epochs={args.max_epochs}")
        cmd += args.overrides
        sh(cmd, cwd=bundle)
        # evaluate.yaml's default ckpt_path is models/fold{N}; the trainer
        # writes runs/fold{N}/ckpt -- point evaluation at the training output.
        ckpt = bundle / "runs" / f"fold{args.fold}" / "ckpt"
    else:
        default = bundle / "models" / f"fold{args.fold}"
        if not default.exists():
            print(
                "no checkpoint: pass --train or --import_ckpt, or place one at "
                f"{default}", file=sys.stderr,
            )
            return 2

    metrics = evaluate(bundle, args.fold, ckpt, args.data_dir, args.overrides)

    meta = json.loads((bundle / "configs" / "metadata.json").read_text())
    target = (meta.get("eval_metrics") or {}).get("mean_dice")
    got = metrics.get("mean_dice")
    valid = isinstance(got, (int, float)) and got == got  # present and not NaN
    print(f"\nmeasured mean Dice: {got:.4f}" if valid else f"\nmeasured mean Dice: {got}")
    if target is None:
        print("metadata has no eval_metrics.mean_dice target; nothing to compare")
        return 0
    print(f"metadata target:    {target:.4f}  (tolerance {args.tolerance})")
    # informational per-region comparison (gate stays on mean_dice)
    for key, tgt in sorted((meta.get("eval_metrics") or {}).items()):
        if key.startswith("dice_") and key in metrics:
            print(f"  {key}: measured {metrics[key]:.4f} vs metadata {tgt:.4f}")
    ok = valid and got >= target - args.tolerance
    print("PARITY: PASS" if ok else "PARITY: FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
