#!/usr/bin/env python
"""Host input-pipeline throughput benchmark (VERDICT round 2, item 3).

Measures the BraTS bundle's transform chain on synthetic native-size NIfTIs
(4 modalities at 240x240x155, like real BraTS cases) and the DataLoader's
delivered batch throughput for thread vs process workers, then compares
against the device train-step rate — if the loader is slower, training is
host-bound and needs more workers / processes / a cache dataset.

    python tools/bench_input.py [--cases 6] [--workers 0 1 4] [--processes]

Reference context: the reference trains with torch's 8-process loader
(train.yaml:190); this environment has a single CPU core, so absolute
scaling numbers here understate a real host — the tool is the instrument
to run at deployment scale.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from factorizer_tpu.config import ConfigParser, load_config_files
from factorizer_tpu.data import DataLoader, Dataset
from factorizer_tpu.data.nifti import save_nifti

REPO = Path(__file__).resolve().parent.parent
DEVICE_STEP_S_B2 = 0.311  # flagship train step, batch 2 bf16 (PERFORMANCE.md)


def make_cases(root: Path, n: int, shape=(240, 240, 155)) -> list[dict]:
    rng = np.random.default_rng(0)
    items = []
    for i in range(n):
        case = root / f"case{i}"
        case.mkdir(parents=True)
        paths = []
        for m in ("t1n", "t1c", "t2w", "t2f"):
            p = case / f"{m}.nii.gz"
            # int16 like real BraTS exports; mostly-zero background so the
            # gzip size/time is realistic
            vol = np.zeros(shape, np.int16)
            s = tuple(slice(40, -40) for _ in shape)
            vol[s] = (rng.random([d - 80 for d in shape]) * 800).astype(np.int16)
            save_nifti(p, vol)
            paths.append(str(p))
        seg = np.zeros(shape, np.uint8)
        seg[90:140, 90:140, 60:100] = rng.integers(1, 4)
        sp = case / "seg.nii.gz"
        save_nifti(sp, seg)
        items.append({"id": f"case{i}", "image": paths, "label": str(sp)})
    return items


def build_transforms():
    cfg = load_config_files([REPO / "zoo" / "factorizer_brats23" / "configs" / "train.yaml"])
    p = ConfigParser(cfg)
    return p["train_preprocessing"], p["val_preprocessing"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=6)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2, 4])
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="bench_input_"))
    print(f"generating {args.cases} synthetic BraTS-size cases under {tmp} ...", flush=True)
    t0 = time.perf_counter()
    items = make_cases(tmp, args.cases)
    print(f"  ... {time.perf_counter() - t0:.1f}s")

    train_pre, val_pre = build_transforms()

    # single-item cost split: deterministic (cacheable) vs full chain
    it = dict(items[0])
    t0 = time.perf_counter(); val_pre(dict(it)); det_s = time.perf_counter() - t0
    t0 = time.perf_counter(); train_pre(dict(it)); full_s = time.perf_counter() - t0
    print(f"per-case deterministic chain: {det_s:.2f}s; full train chain: {full_s:.2f}s "
          f"(random tail ~{full_s - det_s:.2f}s)")

    results = {"per_case_det_s": round(det_s, 3), "per_case_full_s": round(full_s, 3),
               "device_step_s_b2": DEVICE_STEP_S_B2, "loader": []}
    ds = Dataset(items, train_pre)
    for procs in (False, True):
        for nw in args.workers:
            if procs and nw == 0:
                continue
            loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                                num_workers=nw, use_processes=procs)
            n = 0
            t0 = time.perf_counter()
            for ep in range(args.epochs):
                loader.set_epoch(ep)
                for batch in loader:
                    n += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            vps = n / dt
            tag = f"{'proc' if procs else 'thread'} x{nw}"
            need = args.batch_size / DEVICE_STEP_S_B2
            print(f"loader [{tag}]: {vps:.2f} cases/s "
                  f"(device needs {need:.1f} vol/s at batch {args.batch_size}) "
                  f"{'HOST-BOUND' if vps < need else 'ok'}")
            results["loader"].append({"mode": tag, "cases_per_s": round(vps, 3)})

    print(json.dumps(results))


if __name__ == "__main__":
    main()
