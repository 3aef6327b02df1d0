#!/usr/bin/env python
"""Build configs/datalist.json: crawl the dataset and assign lesion-volume-
stratified cross-validation folds (reference: scripts/make_datalist.py)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from factorizer_tpu.data import load_nifti, stratified_kfold


def _convert_png(png: Path, out: Path, binarize: bool) -> None:
    """FIVES ships PNGs; convert to NIfTI once so the pipeline stays uniform."""
    from PIL import Image

    from factorizer_tpu.data import save_nifti

    arr = np.asarray(Image.open(png))
    if binarize:
        arr = (arr > 127).astype(np.uint8)
        if arr.ndim == 3:
            arr = arr[..., 0]
    out.parent.mkdir(parents=True, exist_ok=True)
    save_nifti(out, arr)


def crawl(data_dir: Path) -> list[dict]:
    """FIVES layout: {train,test}/Original + Ground truth (PNG or NIfTI)."""
    items = []
    for split in ("train", "test"):
        orig = data_dir / split / "Original"
        gt_dir = next(
            (data_dir / split / n for n in ("GroundTruth", "Ground truth")
             if (data_dir / split / n).exists()),
            data_dir / split / "GroundTruth",
        )
        if not orig.exists():
            continue
        for img in sorted(list(orig.glob("*.nii.gz")) + list(orig.glob("*.png"))):
            lbl = gt_dir / img.name
            if not lbl.exists():
                continue
            if img.suffix == ".png":
                nii_img = data_dir / split / "Original_nii" / (img.stem + ".nii.gz")
                nii_lbl = data_dir / split / "GroundTruth_nii" / (img.stem + ".nii.gz")
                if not nii_img.exists():
                    _convert_png(img, nii_img, binarize=False)
                if not nii_lbl.exists():
                    _convert_png(lbl, nii_lbl, binarize=True)
                img, lbl = nii_img, nii_lbl
            items.append(
                {
                    "id": f"{split}_{img.name.split('.')[0]}",
                    "image": str(img.relative_to(data_dir)),
                    "label": str(lbl.relative_to(data_dir)),
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
