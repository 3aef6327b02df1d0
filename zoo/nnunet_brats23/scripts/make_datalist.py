#!/usr/bin/env python
"""Build configs/datalist.json for BraTS23-GLI, byte-compatible with the
reference's manifest (reference: scripts/make_datalist.py + the shipped
configs/datalist.json):

* crawl ``*Training*/*`` / ``*Validation*/*`` case folders; paths stay
  relative to ``data_dir`` and include the challenge parent directory
* modality order **t1n, t1c, t2w, t2f** (make_datalist.py:37-42)
* the validation tree becomes the image-only ``test`` section, sorted by id
* folds: enhancing-tumor (label==3) volume, quantized into ``num_bins``
  histogram bins, then ``StratifiedKFold(shuffle=True, random_state=42)``
  (make_datalist.py:61-108); training entries sorted by id with key order
  ``id, image, label, fold``
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from pathlib import Path

import numpy as np

from factorizer_tpu.data import load_nifti

MODALITIES = ("t1n", "t1c", "t2w", "t2f")


def crawl(data_dir: Path) -> tuple[list[dict], list[dict]]:
    """Return (training items, test items) with data_dir-relative paths."""

    def case_entry(folder: str, with_label: bool) -> dict | None:
        case = os.path.basename(folder)
        imgs = []
        for m in MODALITIES:
            hits = glob.glob(os.path.join(folder, f"*{m}.nii.gz"))
            if not hits:
                return None
            imgs.append(os.path.relpath(hits[0], data_dir))
        item = {"id": case, "image": imgs}
        if with_label:
            seg = glob.glob(os.path.join(folder, "*seg.nii.gz"))
            if not seg:
                return None
            item["label"] = os.path.relpath(seg[0], data_dir)
        return item

    train = [
        e
        for f in sorted(glob.glob(str(data_dir / "*Training*" / "*")))
        if (e := case_entry(f, with_label=True)) is not None
    ]
    test = sorted(
        (
            e
            for f in sorted(glob.glob(str(data_dir / "*Validation*" / "*")))
            if (e := case_entry(f, with_label=False)) is not None
        ),
        key=lambda x: x["id"],
    )
    return train, test


def lesion_volume(data_dir: Path, item: dict) -> float:
    """Enhancing-tumor (label 3) volume in mm^3 (make_datalist.py:61-68)."""
    lbl = load_nifti(data_dir / item["label"])
    return float((np.asarray(lbl.data) == 3).sum() * np.prod(lbl.spacing))


def assign_folds(items: list[dict], volumes: list[float], num_bins: int, num_folds: int) -> list[dict]:
    """Stratified folds over quantized lesion volume; sorted by id."""
    from sklearn.model_selection import StratifiedKFold

    edges = np.histogram_bin_edges(volumes, bins=num_bins)
    y = np.digitize(volumes, edges[:-1])
    skf = StratifiedKFold(n_splits=num_folds, shuffle=True, random_state=42)
    out: list[dict] = []
    for fold, (_, val_idx) in enumerate(skf.split(items, y)):
        for j in val_idx:
            out.append({**items[j], "fold": fold})
    return sorted(out, key=lambda x: x["id"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--output", default="configs/datalist.json")
    ap.add_argument("--num_bins", type=int, default=5)
    ap.add_argument("--num_folds", type=int, default=5)
    args = ap.parse_args()

    data_dir = Path(args.data_dir)
    train, test = crawl(data_dir)
    print(f"found {len(train)} training / {len(test)} test cases")

    volumes = [lesion_volume(data_dir, it) for it in train]
    train = assign_folds(train, volumes, args.num_bins, args.num_folds)

    with open(args.output, "w") as f:
        json.dump({"training": train, "test": test}, f)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
