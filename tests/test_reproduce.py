"""tools/reproduce.py — the one-command quality-parity harness — runs green
on a synthetic BraTS-layout tree (VERDICT round 2, item 5).

Rehearses the full chain exactly as a user would run it:
make_datalist (crawl + stratified folds) -> bundle-CLI training ->
bundle-CLI evaluation -> metadata comparison, all via subprocess so the real
entry points are exercised.
"""

import json
import shutil
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from factorizer_tpu.data.nifti import save_nifti

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def brats_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats_data")
    rng = np.random.default_rng(0)
    train = root / "ASNR-MICCAI-BraTS2023-GLI-Challenge-TrainingData"
    for i in range(10):
        case = f"BraTS-GLI-{i:05d}-000"
        d = train / case
        d.mkdir(parents=True)
        for m in ("t1n", "t1c", "t2w", "t2f"):
            save_nifti(d / f"{case}-{m}.nii.gz", rng.random((20, 20, 20), np.float32))
        seg = np.zeros((20, 20, 20), np.uint8)
        seg[6 : 10 + i % 3, 6:14, 6:14] = (i % 3) + 1
        save_nifti(d / f"{case}-seg.nii.gz", seg)
    return root


def test_reproduce_harness_synthetic(brats_tree, tmp_path):
    bundle = tmp_path / "factorizer_brats23"
    shutil.copytree(REPO / "zoo" / "factorizer_brats23", bundle)
    # force the crawl path (the shipped manifest points at the real dataset)
    (bundle / "configs" / "datalist.json").write_text(
        json.dumps({"training": [], "test": []})
    )

    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "reproduce.py"),
            "--bundle", str(bundle),
            "--data_dir", str(brats_tree),
            "--train", "--max_epochs", "1", "--fold", "0",
            "--tolerance", "1.0",  # synthetic 1-epoch run: exercise, not meet, the bar
            "roi_size=[16,16,16]",
            "batch_size=2",
            "num_workers=0",
            "val_interval=1",
            "network_def#encoder_depth=[1,1]",
            "network_def#encoder_width=[8,16]",
            "network_def#strides=[1,2]",
            "network_def#decoder_depth=[1]",
            "network_def#reshape=[$ftx.SWMatricize, {head_dim: 4, patch_size: 4, shifts: [null, 2]}]",
            "trainer#sw_batch_size=2",
            "trainer#compute_hd95=False",
        ],
        capture_output=True,
        text=True,
        timeout=2400,
        # the bundle CLI honors FTX_PLATFORM (the axon TPU plugin ignores
        # JAX_PLATFORMS): this CI flow must run on CPU even with a TPU around
        env={**os.environ, "FTX_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "PARITY: PASS" in proc.stdout
    # the real artifacts exist: generated manifest, checkpoint, per-case metrics
    datalist = json.loads((bundle / "configs" / "datalist.json").read_text())
    assert len(datalist["training"]) == 10
    metrics = json.loads((bundle / "runs" / "fold0" / "case_metrics.json").read_text())
    assert "mean_dice" in metrics and metrics["cases"]


def test_reproduce_import_torch_checkpoint(brats_tree, tmp_path):
    """--import_ckpt: a reference torch checkpoint converts into the bundle's
    models/fold0 and evaluation runs from the imported weights — the exact
    route for reproducing the reference's published Dice without retraining."""
    torch = pytest.importorskip("torch")
    import sys as _sys

    if "/root/reference" not in _sys.path:
        _sys.path.insert(0, "/root/reference")
    ft_ref = pytest.importorskip("factorizer")

    ref = ft_ref.Factorizer(
        in_channels=4, out_channels=3, spatial_size=(16, 16, 16),
        encoder_depth=(1, 1), encoder_width=(8, 16), strides=(1, 2),
        decoder_depth=(1,), norm=ft_ref.LayerNorm,
        reshape=(ft_ref.SWMatricize, {"head_dim": 4, "patch_size": 4}),
        factorize=ft_ref.NMF, rank=1, num_iters=2, init="uniform",
        solver="hals", mlp_ratio=2,
    )
    ckpt = tmp_path / "model.pt"
    torch.save({"state_dict": ref.state_dict()}, ckpt)

    bundle = tmp_path / "factorizer_brats23"
    shutil.copytree(REPO / "zoo" / "factorizer_brats23", bundle)

    proc = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "reproduce.py"),
            "--bundle", str(bundle),
            "--data_dir", str(brats_tree),
            "--import_ckpt", str(ckpt),
            "--fold", "0",
            "--tolerance", "1.0",
            "--remake_datalist",
            "roi_size=[16,16,16]",
            "num_workers=0",
            "network_def#encoder_depth=[1,1]",
            "network_def#encoder_width=[8,16]",
            "network_def#strides=[1,2]",
            "network_def#decoder_depth=[1]",
            "network_def#num_iters=2",
            "network_def#mlp_ratio=2",
            "network_def#reshape=[$ftx.SWMatricize, {head_dim: 4, patch_size: 4, shifts: [null, 2]}]",
            "trainer#compute_hd95=False",
        ],
        capture_output=True, text=True, timeout=2400,
        env={**os.environ, "FTX_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "PARITY: PASS" in proc.stdout
    assert (bundle / "models" / "fold0").exists()
    metrics = json.loads((bundle / "runs" / "fold0" / "case_metrics.json").read_text())
    assert "mean_dice" in metrics
