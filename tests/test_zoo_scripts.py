"""End-to-end tests for the bundle programs: evaluate + ensemble inference."""

import json

import jax
import numpy as np
import pytest

import factorizer_tpu as ftx
from factorizer_tpu.data import DataLoader, Dataset
from factorizer_tpu.data import transforms as T
from factorizer_tpu.data.nifti import load_nifti, save_nifti
from factorizer_tpu.train.checkpoint import save_checkpoint
from factorizer_tpu.train.trainer import create_train_state
from factorizer_tpu.zoo_scripts import (
    ensemble_inference,
    evaluate_bundle,
    fuse_brats_labels,
)

SP = (16, 16, 16)


def _tiny_model():
    return ftx.Factorizer(
        in_channels=1,
        out_channels=1,
        spatial_size=SP,
        encoder_depth=(1, 1),
        encoder_width=(4, 8),
        strides=(1, 2),
        decoder_depth=(1,),
        reshape=(ftx.SWMatricize, {"head_dim": 2, "patch_size": 4, "shifts": [None, 2]}),
        rank=1,
        num_iters=2,
        init_method="uniform",
        solver="hals",
        mlp_ratio=2,
    )


@pytest.fixture(scope="module")
def ckpt_and_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("zoo_scripts")
    rng = np.random.default_rng(0)

    # synthetic dataset on disk
    data_dir = tmp / "data"
    items = []
    for i in range(2):
        case = data_dir / f"c{i}"
        case.mkdir(parents=True)
        save_nifti(case / "img.nii.gz", rng.random(SP).astype(np.float32))
        lbl = np.zeros(SP, np.uint8)
        lbl[4:12, 4:12, 4:12] = 1
        save_nifti(case / "seg.nii.gz", lbl)
        items.append(
            {"id": f"c{i}", "image": f"c{i}/img.nii.gz", "label": f"c{i}/seg.nii.gz", "fold": 0}
        )
    datalist = tmp / "datalist.json"
    datalist.write_text(json.dumps({"training": items, "test": items}))

    # a checkpoint in the layout the bundles expect
    model = _tiny_model()
    import optax

    state = create_train_state(
        model, optax.adamw(1e-3), np.zeros((1, 1, *SP), np.float32),
        jax.random.key(0), {"train": False},
    )
    ckpt_path = tmp / "models" / "fold0"
    save_checkpoint(ckpt_path, state)
    return model, tmp, data_dir, datalist, ckpt_path


def test_evaluate_bundle(ckpt_and_data):
    model, tmp, data_dir, datalist, ckpt_path = ckpt_and_data
    pre = T.Compose(
        [
            T.LoadImaged(["image"]),
            T.LoadImaged(["label"], dtype=np.uint8),
            T.SpatialPadd(["image", "label"], spatial_size=SP),
        ]
    )
    items = json.loads(datalist.read_text())["training"]
    items = [
        {**it, "image": str(data_dir / it["image"]), "label": str(data_dir / it["label"])}
        for it in items
    ]
    loader = DataLoader(Dataset(items, pre), batch_size=1, num_workers=0)

    metrics = evaluate_bundle(
        model,
        ckpt_path,
        loader,
        roi_size=SP,
        output_dir=str(tmp / "preds"),
        case_metrics_path=str(tmp / "case_metrics.json"),
        compute_hd95=True,
    )
    assert "mean_dice" in metrics
    saved = json.loads((tmp / "case_metrics.json").read_text())
    assert len(saved["cases"]) == 2
    # predictions were inverted + written as NIfTI
    preds = list((tmp / "preds").glob("*.nii.gz"))
    assert len(preds) == 2
    assert load_nifti(preds[0]).data.shape == SP
    # MetricsSaver-style CSVs (reference evaluate.yaml:49-54)
    raw = (tmp / "metrics" / "mean_dice_raw.csv").read_text().splitlines()
    assert raw[0].startswith("filename,class0")
    assert raw[0].endswith(",mean") and len(raw) == 3  # header + 2 cases
    summary = (tmp / "metrics" / "mean_dice_summary.csv").read_text().splitlines()
    assert summary[0] == "class,mean,median,max,min,90percentile,std"
    assert (tmp / "metrics" / "hd95_raw.csv").exists()
    assert (tmp / "metrics" / "metrics.csv").exists()


def test_ensemble_inference(ckpt_and_data):
    model, tmp, data_dir, datalist, ckpt_path = ckpt_and_data
    saved = ensemble_inference(
        model,
        ckpt_paths=[str(ckpt_path), str(ckpt_path)],  # 2-member "ensemble"
        datalist_path=str(datalist),
        data_dir=str(data_dir),
        roi_size=SP,
        pix_size=(1.0, 1.0, 1.0),
        output_dir=str(tmp / "ens_preds"),
        section="test",
    )
    assert len(saved) == 2
    assert all(p is not None for p in saved)


def test_fuse_brats_labels():
    pred = np.zeros((3, 4, 4, 4), np.uint8)
    pred[2, :2] = 1  # WT
    pred[1, :1] = 1  # TC nested
    pred[0, 0, 0, 0] = 1  # ET nested
    fused = fuse_brats_labels(pred)
    assert fused[0, 0, 0] == 3  # ET wins
    assert fused[0, 1, 0] == 1  # TC
    assert fused[1, 0, 0] == 2  # WT only
    assert fused[3, 0, 0] == 0


def test_ensemble_inference_aot(ckpt_and_data):
    """AOT-compiled serving path (the TensorRT-overlay analogue)."""
    model, tmp, data_dir, datalist, ckpt_path = ckpt_and_data
    saved = ensemble_inference(
        model,
        ckpt_paths=[str(ckpt_path)],
        datalist_path=str(datalist),
        data_dir=str(data_dir),
        roi_size=SP,
        pix_size=(1.0, 1.0, 1.0),
        output_dir=str(tmp / "aot_preds"),
        section="test",
        aot_compile=True,
    )
    assert len(saved) == 2 and all(p is not None for p in saved)


def test_evaluate_loads_trainer_checkpoint_root(ckpt_and_data, tmp_path):
    """evaluate_bundle accepts the TRAINER's ckpt_dir directly (orbax
    CheckpointManager step dirs), not just one-shot checkpoints — the
    train.sh -> evaluate.sh handoff."""
    import optax

    from factorizer_tpu.train.checkpoint import CheckpointManager
    from factorizer_tpu.zoo_scripts import load_model_checkpoint

    model, tmp, data_dir, datalist, _ = ckpt_and_data
    state = create_train_state(
        model, optax.adamw(1e-3), np.zeros((1, 1, *SP), np.float32),
        jax.random.key(0), {"train": False},
    )
    mgr = CheckpointManager(tmp_path / "ckpt_root", max_to_keep=2)
    mgr.save(1, state)
    mgr.save(2, state)
    mgr.close()  # blocks until async saves land

    # root -> latest step; step dir -> its item; both load the same params
    v_root = load_model_checkpoint(model, tmp_path / "ckpt_root", SP)
    v_step = load_model_checkpoint(model, tmp_path / "ckpt_root" / "2", SP)
    a = jax.tree.leaves(v_root["params"])[0]
    b = jax.tree.leaves(v_step["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluator_predictor_shared_across_instances():
    """Evaluators over the same model config must reuse one predictor
    closure: the sliding-window runner cache keys on predictor identity,
    so a fresh lambda per Evaluator re-traces (and re-loads) the compiled
    sliding-window executable on every evaluate_bundle call (measured tens
    of seconds per case at BraTS-native shapes)."""
    from factorizer_tpu.train.loop import Evaluator, _shared_predictor

    m1, m2 = _tiny_model(), _tiny_model()
    assert _shared_predictor(m1)[1] is _shared_predictor(m2)[1]

    other = ftx.Factorizer(
        in_channels=1, out_channels=2, spatial_size=SP,
        encoder_depth=(1, 1), encoder_width=(4, 8), strides=(1, 2),
        decoder_depth=(1,),
        reshape=(ftx.SWMatricize, {"head_dim": 2, "patch_size": 4, "shifts": [None, 2]}),
        rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
    )
    assert _shared_predictor(other)[1] is not _shared_predictor(m1)[1]

    x = np.zeros((1, 1, *SP), np.float32)
    v = jax.jit(m1.init)(jax.random.key(0), x)
    e1 = Evaluator(m1, v, roi_size=SP, sw_batch_size=1, compute_hd95=False)
    e2 = Evaluator(m2, v, roi_size=SP, sw_batch_size=1, compute_hd95=False)
    assert e1._sw_predict is e2._sw_predict
    np.testing.assert_array_equal(
        np.asarray(e1.predict(x)), np.asarray(e2.predict(x))
    )
