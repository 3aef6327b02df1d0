#!/usr/bin/env python
"""Visual data-pipeline check: run the bundle transform chain on a case and
save a center-slice image/label panel (reference: tests/check_amos22.py —
that script plt.show()s interactively; headless here, we write a PNG).

Usage:
    python tools/check_pipeline.py --image <img.nii.gz> --label <seg.nii.gz> \
        [--roi 128] [--output pipeline_check.png]

With no --image, a synthetic sphere case is generated so the full chain is
still exercised end-to-end.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from factorizer_tpu.data import DataLoader, Dataset
from factorizer_tpu.data import transforms as T
from factorizer_tpu.data.nifti import save_nifti


def build_transforms(roi: int) -> T.Compose:
    """The BraTS23 bundle train pipeline (zoo/*/configs/train.yaml)."""
    keys = ["image", "label"]
    return T.Compose(
        [
            T.LoadImaged(["image"], ensure_channel_first=True),
            T.LoadImaged(["label"], ensure_channel_first=True, dtype=np.uint8),
            T.CropForegroundd(keys, source_key="image", margin=10),
            T.Orientationd(keys, axcodes="RAS"),
            T.NormalizeIntensityd(["image"], nonzero=True, channel_wise=True),
            T.Spacingd(keys, pixdim=(1.0, 1.0, 1.0), mode=("bilinear", "nearest")),
            T.SpatialPadd(keys, spatial_size=(roi,) * 3),
            T.RandSpatialCropd(keys, roi_size=(roi,) * 3),
            T.RandAffined(keys, prob=0.2, rotate_range=(0.26,) * 3, scale_range=(0.2,) * 3,
                          mode=("bilinear", "nearest")),
            T.RandGaussianNoised(["image"], prob=0.2, mean=0.0, std=0.1),
            T.RandGaussianSmoothd(["image"], prob=0.2, sigma_x=(0.5, 1.0),
                                  sigma_y=(0.5, 1.0), sigma_z=(0.5, 1.0)),
            T.RandScaleIntensityd(["image"], prob=0.2, factors=0.3),
            T.RandShiftIntensityd(["image"], prob=0.2, offsets=0.1),
            T.RandFlipd(keys, prob=0.5, spatial_axis=0),
            T.RandFlipd(keys, prob=0.5, spatial_axis=1),
            T.RandFlipd(keys, prob=0.5, spatial_axis=2),
        ]
    ).set_random_state(0)


def synthetic_case(tmp: Path) -> dict:
    rng = np.random.default_rng(0)
    img = rng.normal(0, 0.3, (64, 64, 64)).astype(np.float32)
    lbl = np.zeros((64, 64, 64), np.uint8)
    zz, yy, xx = np.ogrid[:64, :64, :64]
    sphere = ((zz - 32) ** 2 + (yy - 30) ** 2 + (xx - 34) ** 2) <= 15**2
    img[sphere] += 1.5
    lbl[sphere] = 1
    save_nifti(tmp / "img.nii.gz", img)
    save_nifti(tmp / "seg.nii.gz", lbl)
    return {"image": str(tmp / "img.nii.gz"), "label": str(tmp / "seg.nii.gz")}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image")
    ap.add_argument("--label")
    ap.add_argument("--roi", type=int, default=64)
    ap.add_argument("--output", default="pipeline_check.png")
    args = ap.parse_args()

    if args.image:
        case = {"image": args.image, "label": args.label}
    else:
        tmp = Path(tempfile.mkdtemp())
        case = synthetic_case(tmp)
        print("no --image given: using a synthetic sphere case")

    loader = DataLoader(
        Dataset([case], build_transforms(args.roi)), batch_size=1, num_workers=0
    )
    sample = next(iter(loader))
    image = np.asarray(sample["image"])[0, 0]
    label = np.asarray(sample["label"])[0, 0]
    print(f"image {image.shape} [{image.min():.2f}, {image.max():.2f}]  "
          f"label {label.shape} classes={sorted(np.unique(label).tolist())}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    k = image.shape[-1] // 2
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(image[:, :, k], cmap="gray")
    axes[0].set_title("image (augmented)")
    axes[1].imshow(label[:, :, k], cmap="jet")
    axes[1].set_title("label")
    axes[2].imshow(image[:, :, k], cmap="gray")
    axes[2].imshow(np.ma.masked_where(label[:, :, k] == 0, label[:, :, k]),
                   cmap="jet", alpha=0.5)
    axes[2].set_title("overlay")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.output, dpi=100)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
