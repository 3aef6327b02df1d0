#!/usr/bin/env python
"""Generate the model-zoo bundles under zoo/.

Emits one bundle directory per (model, dataset) pair with the same structure
as the reference model_zoo (reference: model_zoo/*/ — 8 configs + scripts +
docs per bundle), re-expressed for this framework's config system, trainer
and TPU runtime.  Run from the repo root:  python tools/gen_zoo.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
ZOO = ROOT / "zoo"

# ---------------------------------------------------------------- datasets

DATASETS = {
    "brats23": dict(
        in_channels=4,
        out_channels=3,
        spatial_dims=3,
        roi_size=[128, 128, 128],
        pix_size=[1.0, 1.0, 1.0],
        batch_size=2,
        # channel order matches the datalist/crawler order (t1n, t1c, t2w, t2f
        # — reference: scripts/make_datalist.py:37-42), NOT alphabetical.
        modalities=["t1n", "t1c", "t2w", "t2f"],
        labels={"0": "background", "1": "NCR/NET", "2": "ED", "3": "ET"},
        regions=["et", "tc", "wt"],
        label_encoder="BraTSOneHotEncoderd",
        description="BraTS 2023 adult glioma segmentation (ET/TC/WT nested regions)",
    ),
    "isles22": dict(
        in_channels=2,
        out_channels=1,
        spatial_dims=3,
        roi_size=[64, 64, 64],
        pix_size=[2.0, 2.0, 2.0],
        batch_size=8,
        modalities=["dwi", "adc"],
        labels={"0": "background", "1": "lesion"},
        regions=["lesion"],
        label_encoder=None,
        description="ISLES 2022 ischemic stroke lesion segmentation",
    ),
    "fives": dict(
        in_channels=3,
        out_channels=1,
        spatial_dims=2,
        roi_size=[512, 512],
        pix_size=[1.0, 1.0],
        batch_size=16,
        modalities=["rgb"],
        labels={"0": "background", "1": "vessel"},
        regions=["vessel"],
        label_encoder=None,
        description="FIVES retinal vessel segmentation (2-D fundus images)",
    ),
}

# ---------------------------------------------------------------- networks


def factorizer_net(ds: dict) -> dict:
    patch = 8 if ds["roi_size"][0] >= 128 else 4
    shifts = [None, 2, 4, 6] if patch == 8 else [None, 1, 2, 3]
    return {
        "_target_": "Factorizer",
        "in_channels": ds["in_channels"],
        "out_channels": ds["out_channels"],
        "spatial_size": "@roi_size",
        "encoder_depth": [1, 1, 1, 1, 1],
        "encoder_width": [32, 64, 128, 256, 512],
        "strides": [1, 2, 2, 2, 2],
        "decoder_depth": [1, 1, 1, 1],
        "norm": "$ftx.LayerNorm",
        "reshape": [
            "$ftx.SWMatricize",
            {"head_dim": 8, "patch_size": patch, "shifts": shifts},
        ],
        "act": "relu",
        "factorize": "$ftx.NMF",
        "rank": 1,
        "num_iters": 5,
        "num_grad_steps": None,
        "init_method": "uniform",
        "solver": "hals",
        "mlp_ratio": 4,
        "remat": "@remat",
    }


def deconver_net(ds: dict) -> dict:
    k = 7 if ds["spatial_dims"] == 2 else 3
    return {
        "_target_": "Deconver",
        "in_channels": ds["in_channels"],
        "out_channels": ds["out_channels"],
        "spatial_dims": ds["spatial_dims"],
        "encoder_depth": [1, 1, 1, 1, 1],
        "encoder_width": [32, 64, 128, 256, 512],
        "strides": [1, 2, 2, 2, 2],
        "decoder_depth": [1, 1, 1, 1],
        "norm": "$ftx.InstanceNorm",
        "act": "relu",
        "groups": -1,
        "ratio": 1,
        "kernel_size": [k] * ds["spatial_dims"],
        "num_iters": 1,
        "num_grad_iters": None,
        "mlp_ratio": 4,
        "remat": "@remat",
    }


def segresnet_net(ds: dict) -> dict:
    return {
        "_target_": "SegResNet",
        "in_channels": ds["in_channels"],
        "out_channels": ds["out_channels"],
        "init_filters": 32,
        "blocks_down": [1, 2, 2, 4],
        "blocks_up": [1, 1, 1],
        # reference bundle has no dropout / upsample override
        # (segresnet_brats23/configs/train.yaml:39-46); MONAI's default
        # upsample is the non-trainable interpolation.
        "upsample_mode": "linear",
    }


def nnunet_net(ds: dict) -> dict:
    nd = ds["spatial_dims"]
    return {
        "_target_": "DynUNet",
        "in_channels": ds["in_channels"],
        "out_channels": ds["out_channels"],
        "spatial_dims": nd,
        "kernel_size": [3, 3, 3, 3, 3],
        "strides": [1, 2, 2, 2, 2],
        # pinned to the reference bundle network_def
        # (nnunet_brats23/configs/train.yaml:39-50): explicit filters, no
        # deep supervision, res_block false.
        "filters": [32, 64, 128, 256, 512],
    }


def swinunetr_net(ds: dict) -> dict:
    return {
        "_target_": "SwinUNETR",
        "img_size": "@roi_size",
        "in_channels": ds["in_channels"],
        "out_channels": ds["out_channels"],
        "feature_size": 24,
        "window_size": 7,  # reference SwinUNETR default window
        "use_v2": False,  # pinned like the reference bundle (train.yaml:46)
    }


MODELS = {
    "factorizer": factorizer_net,
    "deconver": deconver_net,
    "segresnet": segresnet_net,
    "nnunet": nnunet_net,
    "swinunetr": swinunetr_net,
}
BUNDLES = [
    # the full reference zoo matrix (model_zoo/)
    ("factorizer", "brats23"),
    ("deconver", "brats23"),
    ("nnunet", "brats23"),
    ("segresnet", "brats23"),
    ("factorizer", "isles22"),
    ("deconver", "isles22"),
    ("nnunet", "isles22"),
    ("segresnet", "isles22"),
    ("swinunetr", "isles22"),
    ("deconver", "fives"),
    ("nnunet", "fives"),
    ("segresnet", "fives"),
]


# ---------------------------------------------------------------- yaml writer


def to_yaml(obj, indent=0) -> str:
    import yaml

    return yaml.safe_dump(obj, sort_keys=False, default_flow_style=None, width=100)


def transforms_yaml(ds: dict) -> tuple[list, list]:
    keys = ["image", "label"]
    load: dict = {"_target_": "LoadImaged", "keys": keys, "ensure_channel_first": True}
    det: list = [load]
    if ds["modalities"] == ["rgb"]:
        load["channel_dim"] = -1  # (H, W, 3) rasters / converted NIfTIs -> (3, H, W)
        # Binarize the vessel mask; handles both raw FIVES PNGs (0/255, the
        # shipped datalist) and make_datalist-converted NIfTIs (0/1)
        # (reference: deconver_fives/configs/train.yaml Lambdad x[0:1]/255).
        det.append(
            {"_target_": "Lambdad", "keys": "label",
             "func": "$lambda x: (x[0:1] > 0.5).astype('uint8')"}
        )
    if ds["label_encoder"]:
        det.append({"_target_": ds["label_encoder"], "keys": "label"})
    if ds["spatial_dims"] == 3:
        det += [
            {"_target_": "CropForegroundd", "keys": keys, "source_key": "image", "margin": 10},
            {"_target_": "Orientationd", "keys": keys, "axcodes": "RAS"},
        ]
    det += [
        {"_target_": "NormalizeIntensityd", "keys": "image", "nonzero": True, "channel_wise": True},
    ]
    if ds["spatial_dims"] == 3:
        det.append(
            {"_target_": "Spacingd", "keys": keys, "pixdim": "@pix_size",
             "mode": ["bilinear", "nearest"]}
        )
    det += [
        {"_target_": "EnsureTyped", "keys": keys, "dtype": ["float32", "uint8"]},
        {"_target_": "SpatialPadd", "keys": keys, "spatial_size": "@roi_size"},
    ]

    nd = ds["spatial_dims"]
    rand: list = [
        {"_target_": "RandSpatialCropd", "keys": keys, "roi_size": "@roi_size"},
        {"_target_": "RandAffined", "keys": keys, "prob": 0.2,
         "rotate_range": [0.26] * nd, "scale_range": [0.2] * nd,
         "mode": ["bilinear", "nearest"], "padding_mode": "border"},
        {"_target_": "RandGaussianNoised", "keys": "image", "prob": 0.2, "mean": 0.0, "std": 0.1},
        {"_target_": "RandGaussianSmoothd", "keys": "image", "prob": 0.2,
         "sigma_x": [0.5, 1.0], "sigma_y": [0.5, 1.0], "sigma_z": [0.5, 1.0]},
        {"_target_": "RandScaleIntensityd", "keys": "image", "prob": 0.2, "factors": 0.3},
        {"_target_": "RandShiftIntensityd", "keys": "image", "prob": 0.2, "offsets": 0.1},
    ]
    for ax in range(nd):
        rand.append({"_target_": "RandFlipd", "keys": keys, "prob": 0.5, "spatial_axis": ax})
    return det, rand


AMP_COMMENT = (
    "# Mixed precision (reference train.yaml:34): bfloat16 network compute,\n"
    "# float32 params/loss/solver math.  `--amp true` reaches the benchmarked\n"
    "# bf16 numbers from this stock bundle.\n"
)


def train_yaml(model: str, dataset: str) -> str:
    ds = DATASETS[dataset]
    det, rand = transforms_yaml(ds)
    cfg = {
        # paths
        "bundle_root": ".",
        "data_dir": f"/data/{dataset}",
        "datalist_path": "$@bundle_root + '/configs/datalist.json'",
        "fold": 0,
        "output_dir": "$@bundle_root + '/runs/fold' + str(@fold)",
        "ckpt_dir": "$@output_dir + '/ckpt'",
        # hyperparameters (reference: model_zoo/*/configs/train.yaml:23-37)
        "roi_size": ds["roi_size"],
        "pix_size": ds["pix_size"],
        "batch_size": ds["batch_size"],
        "max_epochs": 500,
        "val_interval": 20,
        "learning_rate": 0.0001,
        "weight_decay": 0.00001,
        "warmup_epochs": 5,
        "num_workers": 8,
        "seed": 123,
        # Mixed precision (reference train.yaml:34): bfloat16 network
        # compute, float32 params/loss/solver math.
        "amp": False,
        # Rematerialize stage activations in the backward (~35% step-time
        # cost): lets configs that OOM a 16 GB chip train (e.g. this bundle
        # at amp=false, batch 2, 128^3 — measured in PERFORMANCE.md).
        "remat": False,
        # network
        "network_def": {
            "dtype": "$jnp.bfloat16 if @amp else None",
            **MODELS[model](ds),
        },
        # datalists
        "train_datalist": {
            "_target_": "load_decathlon_datalist",
            "path": "@datalist_path",
            "section": "training",
            "fold": "@fold",
            "base_dir": "@data_dir",
        },
        "val_datalist": {
            "_target_": "load_decathlon_datalist",
            "path": "@datalist_path",
            "section": "validation",
            "fold": "@fold",
            "base_dir": "@data_dir",
        },
        # transforms
        "deterministic_transforms": det,
        "random_transforms": rand,
        "train_preprocessing": {
            "_target_": "Compose",
            "transforms": "$@deterministic_transforms + @random_transforms",
        },
        "val_preprocessing": {"_target_": "Compose", "transforms": "@deterministic_transforms"},
        # datasets / loaders
        "train_dataset": {
            "_target_": "Dataset",
            "data": "@train_datalist",
            "transform": "@train_preprocessing",
        },
        "val_dataset": {
            "_target_": "Dataset",
            "data": "@val_datalist",
            "transform": "@val_preprocessing",
        },
        "train_dataloader": {
            "_target_": "DataLoader",
            "dataset": "@train_dataset",
            "batch_size": "@batch_size",
            "shuffle": True,
            "num_workers": "@num_workers",
            "drop_last": True,
        },
        "val_dataloader": {
            "_target_": "DataLoader",
            "dataset": "@val_dataset",
            "batch_size": 1,
            "shuffle": False,
            "num_workers": "@num_workers",
        },
        "mesh": None,
        # trainer (replaces ignite SupervisedTrainer, train.yaml:340-352)
        "trainer": {
            "_target_": "SegmentationTrainer",
            "model": "@network_def",
            "train_loader": "@train_dataloader",
            "val_loader": "@val_dataloader",
            "max_epochs": "@max_epochs",
            "val_interval": "@val_interval",
            "lr": "@learning_rate",
            "weight_decay": "@weight_decay",
            "warmup_epochs": "@warmup_epochs",
            "roi_size": "@roi_size",
            "sw_batch_size": 2,
            "overlap": 0.5,
            "ckpt_dir": "@ckpt_dir",
            "log_dir": "@output_dir",
            "mesh": "@mesh",
            "seed": "@seed",
        },
        "run": ["$@trainer.run()"],
    }
    out = to_yaml(cfg).replace("amp: false", AMP_COMMENT + "amp: false", 1)
    return out.replace(
        "remat: false",
        "# Rematerialize stage activations in the backward (~35% step cost):\n"
        "# fits configs that OOM a 16 GB chip (see PERFORMANCE.md).\n"
        "remat: false",
        1,
    )


def train_multidevice_yaml() -> str:
    cfg = {
        # Overlay applied on top of train.yaml: data-parallel mesh over all
        # local devices; gradient all-reduce is inserted by XLA over ICI
        # (replaces DDP/NCCL, reference: train_multigpu.yaml:1-39).
        "mesh": {"_target_": "factorizer_tpu.parallel.mesh.data_parallel_mesh"},
        "train_datalist": {
            "_target_": "load_decathlon_datalist",
            "path": "@datalist_path",
            "section": "training",
            "fold": "@fold",
            "base_dir": "@data_dir",
        },
        # Per-host datalist sharding replaces DistributedSampler on multi-host
        # pods; on a single host all devices share the global batch.
        "sharded_train_datalist": "$partition_datalist(@train_datalist, jax.process_count(), jax.process_index())",
        "train_dataset#data": "@sharded_train_datalist",
    }
    return to_yaml(cfg)


def train_tp_yaml() -> str:
    cfg = {
        # Overlay: {data x model} mesh with the MODEL axis spanning hosts —
        # TP parameter shards + the spatially-sharded batch ride the
        # inter-host links while each host's local devices carry different
        # batch rows (the TPU-native upgrade axis beyond the reference's
        # pure-DDP train_multigpu.yaml; exercised end-to-end by
        # tests/test_multiprocess.py::test_two_process_tp_spatial_trainer).
        "mesh": {"_target_": "factorizer_tpu.parallel.mesh.model_parallel_mesh"},
        # Under this layout every host's devices hold shards of EVERY batch
        # row, so all hosts load the full datalist (data_process_groups
        # returns (1, 0)); no per-host partitioning.
        "trainer#model_axis": "model",
        "trainer#shard_spatial": True,
    }
    return to_yaml(cfg)


def evaluate_yaml(ds: dict) -> str:
    cfg = {
        # Overlay: restore a checkpoint, run sliding-window eval with metrics,
        # invert preprocessing and save NIfTI predictions
        # (reference: evaluate.yaml:11-54).
        "ckpt_path": "$@bundle_root + '/models/fold' + str(@fold)",
        "pred_dir": "$@output_dir + '/preds'",
        "evaluator": {
            "_target_": "factorizer_tpu.zoo_scripts.evaluate_bundle",
            "model": "@network_def",
            "ckpt_path": "@ckpt_path",
            "val_loader": "@val_dataloader",
            "roi_size": "@roi_size",
            "output_dir": "@pred_dir",
            "case_metrics_path": "$@output_dir + '/case_metrics.json'",
            # per-region dice keys in the output match metadata eval_metrics
            "channel_names": ds["regions"],
        },
        "run": ["@evaluator"],
    }
    return to_yaml(cfg)


def inference_yaml(ds: dict, dataset: str) -> str:
    cfg = {
        "bundle_root": ".",
        "data_dir": f"/data/{dataset}",
        "datalist_path": "$@bundle_root + '/configs/datalist.json'",
        "output_dir": "$@bundle_root + '/preds'",
        "roi_size": ds["roi_size"],
        "pix_size": ds["pix_size"],
        # all fold checkpoints -> mean ensemble (reference: inference.yaml:13,107-152)
        # network_def comes from the layered train.yaml (docs/inference.sh
        # passes both config files); re-declaring it here as '@network_def'
        # would be a self-reference cycle.
        "ckpt_paths": "$sorted(glob.glob(@bundle_root + '/models/fold*'))",
        "inferencer": {
            "_target_": "factorizer_tpu.zoo_scripts.ensemble_inference",
            "model": "@network_def",
            "ckpt_paths": "@ckpt_paths",
            "datalist_path": "@datalist_path",
            "data_dir": "@data_dir",
            "roi_size": "@roi_size",
            "pix_size": "@pix_size",
            "output_dir": "@output_dir",
            "dataset": dataset,
        },
        "run": ["@inferencer"],
    }
    return to_yaml(cfg)


def inference_aot_yaml() -> str:
    return to_yaml(
        {
            # Overlay: ahead-of-time compile the sliding-window predictor for
            # serving (the XLA analogue of the reference's TensorRT overlay,
            # inference_trt.yaml:1-5).
            "inferencer#aot_compile": True,
        }
    )


# Reference-published eval targets (model_zoo/<task>/configs/metadata.json:40-45;
# the FIVES metadata value is internally inconsistent with its README's "90%" —
# the metadata number is used here).
EVAL_TARGETS = {
    "brats23": {
        "mean_dice": 0.8518,
        "dice_tc": 0.8559,
        "dice_wt": 0.9026,
        "dice_et": 0.7905,
    },
    "isles22": {"mean_dice": 0.75},
    "fives": {"mean_dice": 0.8518},
}


def metadata_json(model: str, dataset: str) -> str:
    ds = DATASETS[dataset]
    return json.dumps(
        {
            "schema": "factorizer_tpu.bundle.v1",
            "name": f"{model}_{dataset}",
            "task": ds["description"],
            "version": "0.1.0",
            "framework": "factorizer_tpu (JAX/Flax/Pallas, TPU-native)",
            "numpy_version": ">=1.24",
            "jax_version": ">=0.4.30",
            "network_data_format": {
                "inputs": {
                    "image": {
                        "type": "image",
                        "num_channels": ds["in_channels"],
                        "modalities": ds["modalities"],
                        "spatial_shape": [f"{2 ** 4}*n"] * ds["spatial_dims"],
                        "dtype": "float32",
                    }
                },
                "outputs": {
                    "pred": {
                        "type": "segmentation",
                        "num_channels": ds["out_channels"],
                        "channels": ds["regions"],
                        "dtype": "float32",
                    }
                },
            },
            "labels": ds["labels"],
            # The reference's published 5-fold CV Dice for this task
            # (reference: model_zoo/*/configs/metadata.json eval_metrics;
            # identical across that zoo's models per task, i.e. task-level
            # targets).  tools/reproduce.py compares measured Dice to these.
            "eval_metrics": EVAL_TARGETS[dataset],
        },
        indent=4,
    )


LOGGING_CONF = """\
[loggers]
keys=root

[handlers]
keys=console

[formatters]
keys=plain

[logger_root]
level=INFO
handlers=console

[handler_console]
class=StreamHandler
level=INFO
formatter=plain
args=(sys.stdout,)

[formatter_plain]
format=%(asctime)s %(levelname)s %(name)s - %(message)s
"""


BRATS23_MAKE_DATALIST = r'''#!/usr/bin/env python
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
'''


def make_datalist_py(dataset: str) -> str:
    if dataset == "brats23":
        return BRATS23_MAKE_DATALIST
    crawl = {
        "isles22": '''\
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
''',
        "fives": '''\
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
''',
    }[dataset]

    return f'''\
#!/usr/bin/env python
"""Build configs/datalist.json: crawl the dataset and assign lesion-volume-
stratified cross-validation folds (reference: scripts/make_datalist.py)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from factorizer_tpu.data import load_nifti, stratified_kfold


{crawl}

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
    print(f"found {{len(items)}} cases")

    volumes = [lesion_volume(data_dir, it) for it in items]
    folds = stratified_kfold(volumes, num_folds=args.num_folds)
    for it, f in zip(items, folds):
        it["fold"] = int(f)

    items = sorted(items, key=lambda x: x["id"])
    with open(args.output, "w") as f:
        json.dump({{"training": items, "test": []}}, f, indent=2)
    print(f"wrote {{args.output}}")


if __name__ == "__main__":
    main()
'''


def bundle_scripts(dataset: str) -> dict[str, str]:
    """Per-bundle helper scripts mirroring the reference's scripts/ layout."""
    ds = DATASETS[dataset]
    data_py = '''\
"""Dataset helpers for this bundle (reference: model_zoo/*/scripts/data.py).

The heavy lifting lives in the framework; this module re-exports the pieces
the configs reference and the label encoding used by this dataset.
"""

from factorizer_tpu.data import load_decathlon_datalist, partition_datalist  # noqa: F401
from factorizer_tpu.data.transforms import (  # noqa: F401
    BraTSOneHotEncoderd,
    Compose,
    LoadImaged,
)
'''
    metrics_py = '''\
"""Metric handlers for this bundle (reference: model_zoo/*/scripts/metrics.py)."""

from factorizer_tpu.train.metrics import (  # noqa: F401
    MeanDice,
    MeanHausdorffDistance,
    dice_metric,
    hausdorff_distance_95,
)
'''
    utils_py = '''\
"""Checkpoint + logging utilities (reference: model_zoo/*/scripts/utils.py)."""

from factorizer_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from factorizer_tpu.utils.torch_import import import_torch_checkpoint  # noqa: F401


def log_model_info(variables) -> str:
    """Parameter-count banner (the LogModelInfoHandler analogue)."""
    import jax

    n = sum(a.size for a in jax.tree.leaves(variables.get("params", {})))
    msg = f"trainable parameters: {n / 1e6:.2f}M"
    print(msg)
    return msg
'''
    return {"data.py": data_py, "metrics.py": metrics_py, "utils.py": utils_py}


DATALIST_PLACEHOLDER = json.dumps(
    {
        "_comment": "placeholder - generate with: bash docs/data.sh (scripts/make_datalist.py)",
        "training": [],
        "test": [],
    },
    indent=2,
)


def datalist_json(dataset: str) -> str:
    """The shipped case manifest for ``dataset``.

    Vendored byte-identical from the reference bundles (pure data: case ids,
    dataset-relative paths, fold assignments — reference:
    model_zoo/*/configs/datalist.json, identical across models per dataset)
    so every bundle is runnable as shipped given $DATA_DIR, like the
    reference's.  Falls back to the placeholder when the vendored manifest is
    absent; scripts/make_datalist.py regenerates it from a dataset tree.
    """
    vendored = ZOO / "_datalists" / f"{dataset}.json"
    if vendored.exists():
        return vendored.read_text()
    return DATALIST_PLACEHOLDER


def docs_shell(model: str, dataset: str) -> dict[str, str]:
    base = f"{model}_{dataset}"
    common = """\
#!/bin/bash
# TPU-pod-ready entry point: run on every host of the slice (single-controller
# JAX initializes multi-host via jax.distributed inside the trainer).
set -euo pipefail
cd "$(dirname "$0")/.."
"""
    return {
        "setup.sh": common + "pip install -e ../../  # install factorizer_tpu\n",
        "data.sh": common
        + 'python scripts/make_datalist.py --data_dir "${DATA_DIR:?set DATA_DIR}" --output configs/datalist.json\n',
        "train.sh": common
        + 'python -m factorizer_tpu.bundle run --config_file configs/train.yaml "$@"\n',
        "train_multidevice.sh": common
        + "python -m factorizer_tpu.bundle run --config_file configs/train.yaml "
        + '--config_file configs/train_multidevice.yaml "$@"\n',
        "evaluate.sh": common
        + "python -m factorizer_tpu.bundle run --config_file configs/train.yaml "
        + '--config_file configs/evaluate.yaml "$@"\n',
        "inference.sh": common
        + 'python -m factorizer_tpu.bundle run --config_file configs/train.yaml --config_file configs/inference.yaml "$@"\n',
        "requirements.txt": "jax\nflax\noptax\norbax-checkpoint\neinops\nnumpy\nscipy\npyyaml\n-e ../../..\n",
        "README.md": f"""\
# {base}

{DATASETS[dataset]["description"]} with the TPU-native **{model}** model.

## Usage

```bash
export DATA_DIR=/path/to/{dataset}
bash docs/data.sh                      # build configs/datalist.json
bash docs/train.sh fold=0              # train one fold (single chip)
bash docs/train_multidevice.sh fold=0  # data-parallel over all local chips
# tensor+spatial parallel over a {{data x model}} mesh (model axis across hosts):
# bash docs/train.sh fold=0 --config_file configs/train.yaml --config_file configs/train_tp.yaml
bash docs/evaluate.sh fold=0           # metrics + NIfTI predictions
bash docs/inference.sh                 # k-fold ensemble inference
```

Any config key can be overridden on the command line
(`learning_rate=3e-4`, `trainer#max_epochs=100`, ...).  Configs layer left to
right, later files and `key=value` pairs win.
""",
    }


def write(path: Path, content: str) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(content)


def main() -> None:
    for model, dataset in BUNDLES:
        ds = DATASETS[dataset]
        b = ZOO / f"{model}_{dataset}"
        write(b / "configs" / "train.yaml", train_yaml(model, dataset))
        write(b / "configs" / "train_multidevice.yaml", train_multidevice_yaml())
        write(b / "configs" / "train_tp.yaml", train_tp_yaml())
        write(b / "configs" / "evaluate.yaml", evaluate_yaml(ds))
        write(b / "configs" / "inference.yaml", inference_yaml(ds, dataset))
        write(b / "configs" / "inference_aot.yaml", inference_aot_yaml())
        write(b / "configs" / "metadata.json", metadata_json(model, dataset))
        write(b / "configs" / "logging.conf", LOGGING_CONF)
        write(b / "configs" / "datalist.json", datalist_json(dataset))
        write(b / "scripts" / "make_datalist.py", make_datalist_py(dataset))
        for name, content in bundle_scripts(dataset).items():
            write(b / "scripts" / name, content)
        for name, content in docs_shell(model, dataset).items():
            write(b / "docs" / name, content)
        print(f"generated zoo/{model}_{dataset}")


if __name__ == "__main__":
    main()
