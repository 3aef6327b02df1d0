#!/usr/bin/env python
"""Build configs/datalist.json: crawl the dataset and assign lesion-volume-
stratified cross-validation folds (reference: scripts/make_datalist.py)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from factorizer_tpu.data import load_nifti, stratified_kfold


def crawl(data_dir: Path) -> list[dict]:
    """BraTS23 layout: <case>/<case>-{t1c,t1n,t2f,t2w,seg}.nii.gz"""
    items = []
    for case_dir in sorted(p for p in data_dir.iterdir() if p.is_dir()):
        case = case_dir.name
        mods = [f"{case}-{m}.nii.gz" for m in ("t1c", "t1n", "t2f", "t2w")]
        if not all((case_dir / m).exists() for m in mods):
            continue
        items.append(
            {
                "id": case,
                "image": [str(Path(case) / m) for m in mods],
                "label": str(Path(case) / f"{case}-seg.nii.gz"),
            }
        )
    return items


def lesion_volume(data_dir: Path, item: dict) -> float:
    lbl = load_nifti(data_dir / item["label"])
    return float((np.asarray(lbl.data) > 0).sum() * np.prod(lbl.spacing))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--output", default="configs/datalist.json")
    ap.add_argument("--num_folds", type=int, default=5)
    args = ap.parse_args()

    data_dir = Path(args.data_dir)
    items = crawl(data_dir)
    print(f"found {len(items)} cases")

    volumes = [lesion_volume(data_dir, it) for it in items]
    folds = stratified_kfold(volumes, num_folds=args.num_folds)
    for it, f in zip(items, folds):
        it["fold"] = int(f)

    items = sorted(items, key=lambda x: x["id"])
    with open(args.output, "w") as f:
        json.dump({"training": items, "test": []}, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
