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
    """ISLES22 BIDS layout: rawdata/sub-*/ses-*/dwi + derivatives masks."""
    items = []
    raw = data_dir / "rawdata"
    for sub in sorted(raw.glob("sub-*")):
        dwis = sorted(sub.glob("ses-*/dwi/*dwi.nii.gz"))
        adcs = sorted(sub.glob("ses-*/dwi/*adc.nii.gz"))
        masks = sorted((data_dir / "derivatives" / sub.name).glob("ses-*/*msk.nii.gz"))
        if dwis and adcs and masks:
            items.append(
                {
                    "id": sub.name,
                    "image": [str(dwis[0].relative_to(data_dir)), str(adcs[0].relative_to(data_dir))],
                    "label": str(masks[0].relative_to(data_dir)),
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
