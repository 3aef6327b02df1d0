"""make_datalist byte-compatibility with the reference BraTS23 manifest.

Builds a synthetic BraTS23-GLI directory tree (TrainingData + ValidationData
challenge folders) and checks the generated datalist has the reference's
exact schema — key order, modality order t1n/t1c/t2w/t2f, challenge-dir
relative paths, image-only test section, StratifiedKFold(seed 42) folds —
and round-trips through load_decathlon_datalist like the reference's
(reference: scripts/make_datalist.py + configs/datalist.json).
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from factorizer_tpu.data import load_decathlon_datalist
from factorizer_tpu.data.nifti import save_nifti

SCRIPT = (
    Path(__file__).resolve().parent.parent
    / "zoo" / "factorizer_brats23" / "scripts" / "make_datalist.py"
)


def _load_script():
    spec = importlib.util.spec_from_file_location("mk_datalist", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["mk_datalist"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def brats_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats")
    rng = np.random.default_rng(0)
    train = root / "ASNR-MICCAI-BraTS2023-GLI-Challenge-TrainingData"
    val = root / "ASNR-MICCAI-BraTS2023-GLI-Challenge-ValidationData"
    for i in range(15):
        case = f"BraTS-GLI-{i:05d}-000"
        d = train / case
        d.mkdir(parents=True)
        for m in ("t1n", "t1c", "t2w", "t2f"):
            save_nifti(d / f"{case}-{m}.nii.gz", rng.random((6, 6, 6), np.float32))
        seg = np.zeros((6, 6, 6), np.uint8)
        seg[: i % 3 + 1, :2, :2] = 3  # 3 volume strata, 5 cases each
        save_nifti(d / f"{case}-seg.nii.gz", seg)
    for i in range(3):
        case = f"BraTS-GLI-{100 + i:05d}-000"
        d = val / case
        d.mkdir(parents=True)
        for m in ("t1n", "t1c", "t2w", "t2f"):
            save_nifti(d / f"{case}-{m}.nii.gz", rng.random((6, 6, 6), np.float32))
    return root


def test_generated_manifest_matches_reference_schema(brats_tree, tmp_path):
    mk = _load_script()
    train, test = mk.crawl(brats_tree)
    volumes = [mk.lesion_volume(brats_tree, it) for it in train]
    train = mk.assign_folds(train, volumes, num_bins=5, num_folds=5)
    out = tmp_path / "datalist.json"
    out.write_text(json.dumps({"training": train, "test": test}))

    ref = json.load(open("/root/reference/model_zoo/factorizer_brats23/configs/datalist.json"))
    got = json.loads(out.read_text())

    # top-level + per-entry key structure identical to the reference's
    assert list(got) == list(ref)
    assert list(got["training"][0]) == list(ref["training"][0])  # id,image,label,fold
    assert list(got["test"][0]) == list(ref["test"][0])  # id,image

    # modality order t1n/t1c/t2w/t2f and challenge-dir-relative paths
    first = got["training"][0]
    assert [p.split("-")[-1] for p in first["image"]] == [
        "t1n.nii.gz", "t1c.nii.gz", "t2w.nii.gz", "t2f.nii.gz"
    ]
    assert first["image"][0].startswith("ASNR-MICCAI-BraTS2023-GLI-Challenge-TrainingData/")
    assert got["test"][0]["image"][0].startswith(
        "ASNR-MICCAI-BraTS2023-GLI-Challenge-ValidationData/"
    )

    # 5 folds over 15 cases, sorted by id, deterministic under seed 42
    assert sorted({it["fold"] for it in got["training"]}) == [0, 1, 2, 3, 4]
    ids = [it["id"] for it in got["training"]]
    assert ids == sorted(ids)
    train2 = mk.assign_folds(
        [{k: v for k, v in it.items() if k != "fold"} for it in got["training"]],
        volumes, num_bins=5, num_folds=5,
    )
    assert [it["fold"] for it in train2] == [it["fold"] for it in got["training"]]

    # loads through load_decathlon_datalist exactly like the reference's
    fold0_val = load_decathlon_datalist(
        out, section="validation", fold=0, base_dir=brats_tree
    )
    fold0_train = load_decathlon_datalist(
        out, section="training", fold=0, base_dir=brats_tree
    )
    assert len(fold0_val) + len(fold0_train) == 15
    assert all(Path(p).exists() for it in fold0_val for p in it["image"])
    test_items = load_decathlon_datalist(out, section="test", base_dir=brats_tree)
    assert len(test_items) == 3 and "label" not in test_items[0]
