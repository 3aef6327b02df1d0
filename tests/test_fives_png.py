"""FIVES bundle runs as shipped: the vendored reference manifest points at
raw PNGs (reference: model_zoo/deconver_fives/configs/datalist.json), so the
pipeline must load/binarize PNGs directly and join base_dir onto .png paths.

Drives the real bundle config + trainer on a synthetic FIVES-layout tree of
raw PNGs at reduced size (the 2-D flow end-to-end).
"""

import json

import numpy as np
import pytest

from factorizer_tpu.config.bundle import run

from pathlib import Path

ZOO = Path(__file__).resolve().parent.parent / "zoo"


@pytest.fixture(scope="module")
def fives_tree(tmp_path_factory):
    PIL = pytest.importorskip("PIL.Image")
    root = tmp_path_factory.mktemp("fives")
    rng = np.random.default_rng(0)
    items = []
    for split, n in (("train", 4),):
        (root / split / "Original").mkdir(parents=True)
        (root / split / "Ground truth").mkdir(parents=True)
        for i in range(n):
            name = f"{i + 1}_A.png"
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            lbl = np.zeros((64, 64), np.uint8)
            lbl[16:48, 16:48] = 255
            PIL.fromarray(img).save(root / split / "Original" / name)
            PIL.fromarray(lbl).save(root / split / "Ground truth" / name)
            # reference-manifest style: dataset-relative RAW PNG paths
            items.append(
                {
                    "id": f"{split}/Original_{i + 1}_A",
                    "image": f"{split}/Original/{name}",
                    "label": f"{split}/Ground truth/{name}",
                    "fold": i % 2,
                }
            )
    datalist = root / "datalist.json"
    datalist.write_text(json.dumps({"training": items, "test": []}))
    return root, datalist


def test_fives_png_bundle_trains(fives_tree, tmp_path):
    root, datalist = fives_tree
    parser = run(
        str(ZOO / "deconver_fives" / "configs" / "train.yaml"),
        run_id=[],
        **{
            "data_dir": str(root),
            "datalist_path": str(datalist),
            "roi_size": [32, 32],
            "batch_size": 2,
            "max_epochs": 1,
            "val_interval": 1,
            "num_workers": 0,
            "ckpt_dir": str(tmp_path / "ckpt"),
            "output_dir": str(tmp_path / "out"),
            "network_def#encoder_depth": [1, 1],
            "network_def#encoder_width": [8, 16],
            "network_def#strides": [1, 2],
            "network_def#decoder_depth": [1],
            "network_def#kernel_size": [3, 3],
            "trainer#sw_batch_size": 2,
            "trainer#compute_hd95": False,
        },
    )
    trainer = parser["trainer"]
    state = trainer.run()
    assert int(state.step) >= 1
    assert np.isfinite(trainer.history[-1]["loss"])
    assert "mean_dice" in trainer.history[-1]
