"""Tests for NIfTI IO, dict transforms (incl. inversion), datasets, config."""

import numpy as np
import pytest

from factorizer_tpu.config import ConfigParser, merge_config, parse_override
from factorizer_tpu.data import (
    DataLoader,
    Dataset,
    CacheDataset,
    load_nifti,
    save_nifti,
    load_decathlon_datalist,
    partition_datalist,
    stratified_kfold,
)
from factorizer_tpu.data import transforms as T


class TestNifti:
    @pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
    def test_roundtrip(self, tmp_path, suffix):
        data = np.random.default_rng(0).random((7, 9, 11)).astype(np.float32)
        affine = np.array(
            [[0, -1.5, 0, 10], [2.0, 0, 0, -5], [0, 0, 1.0, 3], [0, 0, 0, 1]], float
        )
        path = tmp_path / f"vol{suffix}"
        save_nifti(path, data, affine)
        img = load_nifti(path)
        np.testing.assert_allclose(img.data, data, atol=1e-6)
        np.testing.assert_allclose(img.affine, affine, atol=1e-5)
        np.testing.assert_allclose(sorted(img.spacing), [1.0, 1.5, 2.0], atol=1e-5)

    def test_int_dtype(self, tmp_path):
        data = (np.random.default_rng(0).random((5, 5, 5)) * 3).astype(np.uint8)
        save_nifti(tmp_path / "m.nii.gz", data)
        img = load_nifti(tmp_path / "m.nii.gz")
        np.testing.assert_array_equal(img.data, data)


def _sample(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((12, 14, 10)).astype(np.float32)
    img[:2] = 0  # background border for crop-foreground
    lbl = np.zeros((12, 14, 10), np.uint8)
    lbl[4:8, 5:9, 3:7] = 1
    lbl[5:7, 6:8, 4:6] = 3
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    save_nifti(tmp_path / "img.nii.gz", img, affine)
    save_nifti(tmp_path / "lbl.nii.gz", lbl, affine)
    return {"image": str(tmp_path / "img.nii.gz"), "label": str(tmp_path / "lbl.nii.gz")}


class TestTransforms:
    def test_load_and_channel_first(self, tmp_path):
        d = T.LoadImaged(["image", "label"])(_sample(tmp_path))
        assert d["image"].shape == (1, 12, 14, 10)
        assert "image_meta" in d

    def test_brats_onehot(self, tmp_path):
        d = T.LoadImaged(["label"], dtype=None)(_sample(tmp_path))
        d = T.BraTSOneHotEncoderd(["label"])(d)
        assert d["label"].shape == (3, 12, 14, 10)
        et, tc, wt = d["label"]
        assert (et <= tc).all() and (tc <= wt).all()  # nested regions

    def test_normalize_nonzero(self, tmp_path):
        d = T.LoadImaged(["image"])(_sample(tmp_path))
        d = T.NormalizeIntensityd(["image"], nonzero=True, channel_wise=True)(d)
        nz = d["image"][d["image"] != 0]
        assert abs(nz.mean()) < 0.1

    def test_spacing_resamples(self, tmp_path):
        d = T.LoadImaged(["image"])(_sample(tmp_path))
        d = T.Spacingd(["image"], pixdim=(1.0, 1.0, 1.0), mode="bilinear")(d)
        assert d["image"].shape == (1, 24, 28, 20)  # 2mm -> 1mm doubles size

    def test_pad_and_crop(self, tmp_path):
        d = T.LoadImaged(["image"])(_sample(tmp_path))
        d = T.SpatialPadd(["image"], spatial_size=(16, 16, 16))(d)
        assert d["image"].shape == (1, 16, 16, 16)
        t = T.RandSpatialCropd(["image"], roi_size=(8, 8, 8))
        t.set_random_state(0)
        d = t(d)
        assert d["image"].shape == (1, 8, 8, 8)

    def test_random_transforms_run(self, tmp_path):
        d = T.LoadImaged(["image", "label"], dtype=None)(_sample(tmp_path))
        d["image"] = d["image"].astype(np.float32)
        pipeline = T.Compose(
            [
                T.RandAffined(["image", "label"], prob=1.0, rotate_range=(0.2, 0.2, 0.2),
                              scale_range=(0.1, 0.1, 0.1), mode=["bilinear", "nearest"]),
                T.RandGaussianNoised(["image"], prob=1.0, std=0.05),
                T.RandGaussianSmoothd(["image"], prob=1.0),
                T.RandScaleIntensityd(["image"], prob=1.0, factors=0.3),
                T.RandShiftIntensityd(["image"], prob=1.0, offsets=0.1),
                T.RandFlipd(["image", "label"], prob=1.0, spatial_axis=0),
            ]
        ).set_random_state(42)
        out = pipeline(d)
        assert out["image"].shape == d["image"].shape
        assert np.isfinite(out["image"]).all()
        assert set(np.unique(out["label"])) <= set(np.unique(d["label"]))  # nearest keeps labels

    def test_worker_error_propagates(self):
        """A transform exception in a worker must raise in the consumer, not
        wedge it on q.get() forever."""
        import pytest

        def bad(d):
            raise ValueError("corrupt case")

        data = [{"x": np.zeros((2,), np.float32), "id": f"c{i}"} for i in range(4)]
        for procs in (False, True):
            dl = DataLoader(Dataset(data, transform=bad), batch_size=2,
                            num_workers=1, use_processes=procs)
            with pytest.raises(RuntimeError, match="worker failed"):
                list(dl)

    def test_persistent_dataset_array_cases_hash_distinctly(self, tmp_path):
        """Case dicts carrying large arrays must not collide via str()'s
        '...' truncation."""
        from factorizer_tpu.data import PersistentDataset

        a = np.zeros(5000, np.float32)
        b = a.copy()
        b[2500] = 99.0
        ds = PersistentDataset([{"x": a}, {"x": b}], transform=lambda d: d,
                               cache_dir=tmp_path / "pc")
        assert ds._key(0) != ds._key(1)
        assert float(ds[1]["x"][2500]) == 99.0

    def test_persistent_dataset_caches_across_instances(self, tmp_path):
        """PersistentDataset runs the deterministic transform once per case
        across epochs AND dataset instances (disk cache), while the random
        tail still runs every access."""
        from factorizer_tpu.data import PersistentDataset

        calls = {"n": 0}

        def det(d):
            calls["n"] += 1
            return {**d, "x": d["x"] * 2}

        rand_calls = {"n": 0}

        def tail(d):
            rand_calls["n"] += 1
            return d

        data = [{"x": np.full((2,), float(i)), "id": f"c{i}"} for i in range(3)]
        ds1 = PersistentDataset(data, transform=det, random_transform=tail,
                                cache_dir=tmp_path / "pc")
        out1 = [ds1[i] for i in range(3)] + [ds1[i] for i in range(3)]
        assert calls["n"] == 3  # second epoch served from disk
        assert rand_calls["n"] == 6
        ds2 = PersistentDataset(data, transform=det, random_transform=tail,
                                cache_dir=tmp_path / "pc")
        out2 = [ds2[i] for i in range(3)]
        assert calls["n"] == 3  # new instance: still cached
        np.testing.assert_array_equal(out2[1]["x"], out1[1]["x"])
        # a different cache_tag invalidates
        ds3 = PersistentDataset(data, transform=det, cache_dir=tmp_path / "pc",
                                cache_tag="v2")
        ds3[0]
        assert calls["n"] == 4

    def test_native_affine_resample_matches_scipy(self):
        """The C++ multi-channel resampler is exact vs scipy.ndimage for
        every (order, mode) combination RandAffined can emit."""
        import scipy.ndimage as ndi

        from factorizer_tpu.data.native import native_affine_resample, native_available

        if not native_available():
            import pytest

            pytest.skip("native toolchain unavailable")
        rs = np.random.RandomState(0)
        arr = rs.rand(3, 13, 11, 9).astype(np.float32)
        ang = rs.uniform(-0.4, 0.4, 3)
        cx, sx = np.cos(ang[0]), np.sin(ang[0])
        cy, sy = np.cos(ang[1]), np.sin(ang[1])
        cz, sz = np.cos(ang[2]), np.sin(ang[2])
        m = (
            np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            @ np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            @ np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            @ np.diag(1 + rs.uniform(-0.3, 0.3, 3))
        )
        center = (np.array(arr.shape[1:]) - 1) / 2.0
        off = center - m @ center
        for order in (0, 1):
            for mode in ("nearest", "constant"):
                ref = np.stack([
                    ndi.affine_transform(c, m, offset=off, order=order, mode=mode,
                                         cval=0.25, prefilter=False)
                    for c in arr
                ])
                got = native_affine_resample(arr, m, off, order=order, mode=mode, cval=0.25)
                assert got is not None
                np.testing.assert_allclose(got, ref, atol=2e-5), (order, mode)

    def test_randaffined_2d_native_matches_scipy(self):
        """The 2-D RandAffined path (depth-1 embedded native resample, incl.
        1-element rotate/scale ranges) matches the scipy formula."""
        import scipy.ndimage as ndi

        rs = np.random.RandomState(0)
        img = rs.rand(3, 41, 37).astype(np.float32)
        t = T.RandAffined(["image"], prob=1.0, rotate_range=(0.3,),
                          scale_range=(0.2,), mode="bilinear")
        t.set_random_state(5)
        out = t({"image": img.copy()})["image"]
        t2 = T.RandAffined(["image"], prob=1.0, rotate_range=(0.3,),
                           scale_range=(0.2,), mode="bilinear")
        t2.set_random_state(5)
        assert t2._do()
        m = t2._matrix(2)
        center = (np.array(img.shape[1:]) - 1) / 2.0
        off = center - m @ center
        ref = np.stack([
            ndi.affine_transform(c, m, offset=off, order=1, mode="nearest", prefilter=False)
            for c in img
        ])
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_spacingd_resample_matches_ndi_zoom(self):
        """Spacingd's native diagonal-affine route is exact vs ndi.zoom
        (endpoint-aligned map, output-shape rounding included)."""
        import scipy.ndimage as ndi

        from factorizer_tpu.data.transforms import Spacingd

        rs = np.random.RandomState(1)
        for shape, zoom in [((2, 13, 11, 9), (1.3, 0.8, 2.0)),
                            ((1, 7, 7, 7), (0.5, 0.5, 0.5)),
                            ((3, 20, 20, 20), (1.17, 0.93, 1.01))]:
            arr = rs.rand(*shape).astype(np.float32)
            for order in (0, 1):
                ref = np.stack([
                    ndi.zoom(c, zoom, order=order, mode="nearest", prefilter=False)
                    for c in arr
                ])
                got = Spacingd._resample(arr, zoom, order)
                assert got.shape == ref.shape
                np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_invertd_roundtrip_geometry(self, tmp_path):
        """pred in processed space -> Invertd -> native image geometry."""
        d = T.LoadImaged(["image"])(_sample(tmp_path))
        orig_shape = d["image"].shape
        pipe = T.Compose(
            [
                T.CropForegroundd(["image"], source_key="image", margin=1),
                T.Orientationd(["image"], axcodes="RAS"),
                T.Spacingd(["image"], pixdim=(1.0, 1.0, 1.0)),
                T.SpatialPadd(["image"], spatial_size=(28, 28, 28)),
            ]
        )
        d = pipe(d)
        d["pred"] = np.ones_like(d["image"])
        out = T.Invertd(["pred"], orig_keys="image")(d)
        assert out["pred"].shape == orig_shape

    def test_post_transforms(self):
        d = {"pred": np.array([[[-10.0, 10.0]]])}
        d = T.Activationsd(["pred"], sigmoid=True)(d)
        d = T.AsDiscreted(["pred"], threshold=0.5)(d)
        np.testing.assert_array_equal(d["pred"], [[[0, 1]]])
        d2 = {"pred": np.random.rand(3, 2, 2)}
        d2 = T.SplitDimd(["pred"], output_postfixes=["et", "tc", "wt"])(d2)
        assert d2["pred_et"].shape == (1, 2, 2)


class TestDatasetLoader:
    def test_dataset_and_loader(self):
        data = [{"x": np.full((2, 2), i, np.float32), "id": f"c{i}"} for i in range(10)]
        ds = Dataset(data)
        dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1)
        batches = list(dl)
        assert len(batches) == 3
        assert batches[0]["x"].shape == (4, 2, 2)
        assert len(batches[0]["id"]) == 4
        # epoch reshuffling is deterministic per epoch
        dl.set_epoch(0)
        again = list(dl)
        np.testing.assert_array_equal(batches[0]["x"], again[0]["x"])

    def test_cache_dataset_applies_random_tail(self):
        calls = {"n": 0}

        def det(d):
            calls["n"] += 1
            return d

        t = T.RandShiftIntensityd(["x"], prob=1.0, offsets=(5.0, 5.0))
        t.set_random_state(0)
        data = [{"x": np.zeros((2,), np.float32)} for _ in range(3)]
        ds = CacheDataset(data, transform=det, random_transform=t, num_workers=0)
        _ = [ds[i] for i in range(3)]
        _ = [ds[i] for i in range(3)]
        assert calls["n"] == 3  # deterministic part cached
        assert ds[0]["x"][0] == pytest.approx(5.0)

    def test_datalist_folds(self, tmp_path):
        import json

        items = [{"id": i, "fold": i % 3} for i in range(9)]
        path = tmp_path / "dl.json"
        path.write_text(json.dumps({"training": items, "test": []}))
        train = load_decathlon_datalist(path, "training", fold=0)
        val = load_decathlon_datalist(path, "validation", fold=0)
        assert len(train) == 6 and len(val) == 3
        assert all(x["fold"] != 0 for x in train)

    def test_partition(self):
        items = list(range(10))
        shards = [partition_datalist(items, 4, i) for i in range(4)]
        assert sorted(sum(shards, [])) == items

    def test_stratified_kfold_balance(self):
        vals = np.concatenate([np.ones(20), np.full(20, 100.0)])
        folds = stratified_kfold(vals, num_folds=5)
        for f in range(5):
            sel = [v for v, g in zip(vals, folds) if g == f]
            assert 1.0 in sel and 100.0 in sel  # each fold sees both strata


class TestConfig:
    def test_refs_exprs_instantiate(self):
        cfg = {
            "a": 3,
            "b": "@a",
            "c": "$@a * 2 + 1",
            "lst": [1, "@a"],
            "norm": {"_target_": "LayerNorm", "dim": 8},
            "disabled": {"_target_": "LayerNorm", "dim": 8, "_disabled_": True},
        }
        p = ConfigParser(cfg)
        assert p["b"] == 3
        assert p["c"] == 7
        assert p["lst"] == [1, 3]
        import factorizer_tpu as ftx

        assert isinstance(p["norm"], ftx.LayerNorm)
        assert p["disabled"] is None

    def test_subkey_refs_and_overlay(self):
        cfg = {"opt": {"lr": 0.1, "wd": 0.01}, "lr2": "$@opt#lr * 2"}
        cfg = merge_config(cfg, {"opt#lr": 0.2})
        p = ConfigParser(cfg)
        assert p["opt"]["lr"] == pytest.approx(0.2)
        assert p["lr2"] == pytest.approx(0.4)

    def test_parse_override(self):
        k, v = parse_override("trainer#lr=0.005")
        assert k == "trainer#lr" and v == pytest.approx(0.005)
        k, v = parse_override("flag=true")
        assert v is True

    def test_dotted_import_target(self):
        p = ConfigParser({"fn": {"_target_": "numpy.zeros", "shape": [2, 2]}})
        assert p["fn"].shape == (2, 2)

    def test_circular_reference_detected(self):
        p = ConfigParser({"a": "@b", "b": "@a"})
        with pytest.raises(ValueError):
            p["a"]


class TestProcessLoader:
    def test_process_pool_loader(self):
        """use_processes=True delivers correct batches and DISTINCT
        augmentation streams per forked worker (fork copies SeedSequence
        spawn counters, so naive spawning would duplicate streams)."""
        t = T.RandShiftIntensityd(["x"], prob=1.0, offsets=(0.0, 100.0))
        t.set_random_state(7)
        data = [{"x": np.zeros((4,), np.float32), "id": f"c{i}"} for i in range(8)]
        ds = Dataset(data, transform=t)
        dl = DataLoader(ds, batch_size=2, num_workers=2, use_processes=True)
        batches = list(dl)
        assert len(batches) == 4
        xs = np.concatenate([b["x"][:, 0] for b in batches])
        assert xs.shape == (8,)
        # all items augmented, and not all identical (distinct worker streams)
        assert (xs != 0).all()
        assert len(np.unique(np.round(xs, 6))) > 1

    def test_process_workers_fresh_stream_per_epoch(self):
        """Each epoch forks a fresh pool with the same worker ids; the RNG
        spawn key must include the epoch or every epoch replays epoch 1's
        augmentation stream exactly."""
        t = T.RandShiftIntensityd(["x"], prob=1.0, offsets=(0.0, 100.0))
        t.set_random_state(7)
        data = [{"x": np.zeros((4,), np.float32), "id": f"c{i}"} for i in range(4)]
        ds = Dataset(data, transform=t)
        dl = DataLoader(ds, batch_size=2, num_workers=2, use_processes=True)

        def epoch_values(epoch):
            dl.set_epoch(epoch)
            out = {}
            for b in list(dl):
                for cid, v in zip(b["id"], np.asarray(b["x"])[:, 0]):
                    out[cid] = float(v)
            return out

        e0, e1 = epoch_values(0), epoch_values(1)
        # same cases, but at least one augmentation must differ across epochs
        assert set(e0) == set(e1)
        assert any(abs(e0[k] - e1[k]) > 1e-9 for k in e0)

    def test_persistent_workers_epoch_streams_and_reuse(self):
        """persistent_workers forks the pool ONCE and reuses it; the epoch
        reaches workers through a shared value, so augmentation streams
        still advance per epoch and batches stay correct across epochs."""
        t = T.RandShiftIntensityd(["x"], prob=1.0, offsets=(0.0, 100.0))
        t.set_random_state(7)
        data = [{"x": np.zeros((4,), np.float32), "id": f"c{i}"} for i in range(4)]
        ds = Dataset(data, transform=t)
        dl = DataLoader(ds, batch_size=2, num_workers=2, use_processes=True,
                        persistent_workers=True)

        def epoch_values(epoch):
            dl.set_epoch(epoch)
            out = {}
            for b in list(dl):
                for cid, v in zip(b["id"], np.asarray(b["x"])[:, 0]):
                    out[cid] = float(v)
            return out

        e0 = epoch_values(0)
        pool_after_e0 = dl._pool
        assert pool_after_e0 is not None  # pool created and kept
        e1 = epoch_values(1)
        assert dl._pool is pool_after_e0  # reused, not re-forked
        assert set(e0) == set(e1)
        # streams advanced: at least one augmentation differs across epochs
        assert any(abs(e0[k] - e1[k]) > 1e-9 for k in e0)
        # all items augmented in both epochs (streams live and per-worker;
        # exact per-item values depend on which racing worker picked the
        # item, so only distributional properties are asserted — same
        # contract as the per-epoch-fork loader)
        assert all(v != 0 for v in (*e0.values(), *e1.values()))
        dl.close()
        assert dl._pool is None

    def test_concurrent_process_loaders_keep_their_datasets(self):
        """Two process-mode loaders iterated in lockstep must each serve
        their OWN dataset (the shared-registry fork handoff is per-pool,
        not a single module global)."""
        a = Dataset([{ "x": np.full((2,), 10.0 + i), "id": f"a{i}"} for i in range(4)])
        b = Dataset([{ "x": np.full((2,), 20.0 + i), "id": f"b{i}"} for i in range(4)])
        dla = DataLoader(a, batch_size=2, num_workers=1, use_processes=True)
        dlb = DataLoader(b, batch_size=2, num_workers=1, use_processes=True)
        for ba, bb in zip(dla, dlb):  # interleaved consumption
            assert all(cid.startswith("a") for cid in ba["id"])
            assert all(cid.startswith("b") for cid in bb["id"])
            assert np.asarray(ba["x"]).min() >= 10 and np.asarray(ba["x"]).max() < 20
            assert np.asarray(bb["x"]).min() >= 20

    def test_abandoned_iteration_releases_pool(self):
        """Breaking out of iteration early must not wedge the producer on a
        full queue (it would leak the forked worker pool)."""
        import time

        from factorizer_tpu.data import dataset as ds_mod

        data = [{"x": np.zeros((2,), np.float32), "id": f"c{i}"} for i in range(12)]
        dl = DataLoader(Dataset(data), batch_size=2, num_workers=1,
                        use_processes=True, prefetch=1)
        it = iter(dl)
        next(it)
        it.close()  # consumer abandons; GeneratorExit runs the finally
        deadline = time.time() + 10
        while ds_mod._shared_datasets and time.time() < deadline:
            time.sleep(0.05)
        assert not ds_mod._shared_datasets, "producer leaked its pool/registry entry"
