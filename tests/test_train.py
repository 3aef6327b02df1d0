"""Tests for losses, metrics, sliding-window inference, and the train loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import factorizer_tpu as ftx
from factorizer_tpu.train import (
    MeanDice,
    dice_ce_loss,
    dice_loss,
    dice_metric,
    hausdorff_distance_95,
    make_adamw,
    sliding_window_inference,
    sliding_window_positions,
)
from factorizer_tpu.train.trainer import create_train_state, make_train_step


class TestLosses:
    def test_dice_loss_perfect(self):
        t = jnp.zeros((2, 3, 8, 8))
        t = t.at[:, :, 2:6, 2:6].set(1.0)
        logits = jnp.where(t > 0, 20.0, -20.0)
        assert float(dice_loss(logits, t)) < 1e-3

    def test_dice_loss_worst(self):
        t = jnp.ones((1, 1, 8, 8))
        logits = jnp.full_like(t, -20.0)
        assert float(dice_loss(logits, t)) > 0.99

    def test_dice_ce_gradient(self):
        t = jax.random.bernoulli(jax.random.key(0), 0.3, (2, 3, 8, 8)).astype(jnp.float32)
        x = jax.random.normal(jax.random.key(1), (2, 3, 8, 8))
        g = jax.grad(lambda x: dice_ce_loss(x, t))(x)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


class TestMetrics:
    def test_dice_metric_exact(self):
        pred = jnp.zeros((1, 2, 8, 8)).at[:, :, :4].set(1)
        assert np.allclose(np.asarray(dice_metric(pred, pred)), 1.0)

    def test_dice_metric_empty_semantics(self):
        # MONAI ignore_empty=False (the bundle setting): both-empty -> 1.0,
        # pred-nonempty-on-empty-GT -> 0.0; ignore_empty=True -> NaN.
        z = jnp.zeros((1, 1, 8, 8))
        p = z.at[:, :, :2].set(1)
        assert np.allclose(np.asarray(dice_metric(z, z)), 1.0)
        assert np.allclose(np.asarray(dice_metric(p, z)), 0.0)
        assert np.isnan(np.asarray(dice_metric(z, z, ignore_empty=True))).all()

    def test_mean_dice_accumulator(self):
        md = MeanDice()
        pred = jnp.zeros((1, 1, 8, 8)).at[:, :, :4].set(1)
        target = jnp.zeros((1, 1, 8, 8)).at[:, :, :4].set(1)
        md.update(pred, target)
        assert md.compute() == pytest.approx(1.0)

    def test_hd95_zero_for_identical(self):
        m = np.zeros((16, 16, 16), bool)
        m[4:12, 4:12, 4:12] = True
        assert hausdorff_distance_95(m, m) == 0.0

    def test_hd95_shifted(self):
        a = np.zeros((16, 16), bool)
        b = np.zeros((16, 16), bool)
        a[4:8, 4:8] = True
        b[6:10, 4:8] = True  # shifted by 2
        d = hausdorff_distance_95(a, b)
        assert 1.0 <= d <= 3.0

    def test_hd95_nan_for_empty(self):
        a = np.zeros((8, 8), bool)
        b = np.ones((8, 8), bool)
        assert np.isnan(hausdorff_distance_95(a, b))

    def test_hd95_anisotropic_spacing(self):
        # Two parallel planes z=4 and z=8: surface distance is 4 voxels
        # along z.  With spacing (1, 1, 2.5) mm the metric must report
        # 4 * 2.5 = 10 mm exactly (hand-computed anisotropic case).
        a = np.zeros((4, 4, 12), bool)
        b = np.zeros((4, 4, 12), bool)
        a[:, :, 4] = True
        b[:, :, 8] = True
        assert hausdorff_distance_95(a, b) == pytest.approx(4.0)
        assert hausdorff_distance_95(a, b, spacing=(1.0, 1.0, 2.5)) == pytest.approx(10.0)
        # homogeneous 4x4 meta affines carry 3 entries even for 2-D masks:
        # the leading ndim entries are used
        a2, b2 = a[:, :, 4], b[:, :, 8]  # identical 2-D slices
        assert hausdorff_distance_95(a2, b2, spacing=(2.0, 1.0, 99.0)) == 0.0

    def test_voxel_spacing_from_meta(self):
        from factorizer_tpu.train.metrics import voxel_spacing_from_meta

        aff = np.diag([1.0, 1.0, 2.5, 1.0])
        aff[:3, 3] = [10, -5, 3]  # translation must not affect spacing
        sp = voxel_spacing_from_meta({"affine": aff})
        assert sp == pytest.approx((1.0, 1.0, 2.5))
        assert voxel_spacing_from_meta({"no_affine": 1}) is None
        assert voxel_spacing_from_meta("not a dict") is None
        # rotated affine: column norms still give the spacing
        c, s = np.cos(0.3), np.sin(0.3)
        rot = np.eye(4)
        rot[:2, :2] = [[c, -s], [s, c]]
        sp = voxel_spacing_from_meta({"affine": rot @ np.diag([2.0, 3.0, 1.0, 1.0])})
        assert sp == pytest.approx((2.0, 3.0, 1.0))

    def test_mean_hd_spacing_threading(self):
        from factorizer_tpu.train.metrics import MeanHausdorffDistance

        a = np.zeros((1, 1, 4, 4, 12), np.uint8)
        b = np.zeros((1, 1, 4, 4, 12), np.uint8)
        a[..., 4], b[..., 8] = 1, 1
        hd = MeanHausdorffDistance()
        hd.update(a, b, spacing=(1.0, 1.0, 2.5))
        assert hd.compute() == pytest.approx(10.0)

    def test_mean_dice_empty_per_channel(self):
        md = MeanDice()
        assert md.compute_per_channel().size == 0
        assert np.isnan(md.compute())


class TestSlidingWindow:
    def test_positions_cover_volume(self):
        pos = sliding_window_positions((20, 20), (8, 8), overlap=0.5)
        covered = np.zeros((20, 20), bool)
        for p in pos:
            covered[p[0] : p[0] + 8, p[1] : p[1] + 8] = True
        assert covered.all()

    def test_identity_predictor_roundtrip(self):
        """With an identity predictor, blending must reproduce the input."""
        x = jax.random.uniform(jax.random.key(0), (1, 2, 20, 20))
        out = sliding_window_inference(x, (8, 8), lambda w: w, sw_batch_size=3, overlap=0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_small_volume_padding(self):
        """Volume smaller than roi gets padded and cropped back."""
        x = jax.random.uniform(jax.random.key(0), (1, 2, 6, 6))
        out = sliding_window_inference(x, (8, 8), lambda w: w * 2.0)
        assert out.shape == (1, 2, 6, 6)
        np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(x), atol=1e-5)

    def test_host_stitch_matches_fused(self):
        """The low-memory host-stitched path blends identically."""
        x = jax.random.uniform(jax.random.key(3), (2, 2, 20, 14))
        pred = lambda w: jnp.tanh(w[:, :1] + w[:, 1:])  # noqa: E731
        fused = sliding_window_inference(x, (8, 8), pred, sw_batch_size=3, overlap=0.5)
        host = sliding_window_inference(
            x, (8, 8), pred, sw_batch_size=3, overlap=0.5, stitch_on_host=True
        )
        np.testing.assert_allclose(np.asarray(host), np.asarray(fused), atol=1e-5)

    def test_adaptive_inferer_degrades_on_oom(self, monkeypatch):
        """OOM on the fused path falls back to host stitching, then halves
        the window batch; the decision sticks across calls."""
        from factorizer_tpu.train import sliding_window as sw

        x = jax.random.uniform(jax.random.key(4), (1, 2, 20, 20))
        pred = lambda w: w  # noqa: E731
        expected = sliding_window_inference(x, (8, 8), pred, sw_batch_size=4)

        calls = []
        real = sw.sliding_window_inference

        def fake(inputs, roi, predictor, **kw):
            calls.append((kw.get("stitch_on_host", False), kw["sw_batch_size"]))
            if not kw.get("stitch_on_host"):
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory while ...")
            if kw["sw_batch_size"] > 2:
                raise RuntimeError("Attempting to allocate 9.99G ...")
            return real(inputs, roi, predictor, **kw)

        monkeypatch.setattr(sw, "sliding_window_inference", fake)
        inf = sw.SlidingWindowInfererAdapt((8, 8), sw_batch_size=4, overlap=0.5)
        with pytest.warns(UserWarning):
            out = inf(x, pred)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
        assert calls == [(False, 4), (True, 4), (True, 2)]
        calls.clear()
        inf(x, pred)  # the degraded rung is sticky: one call, no retries
        assert calls == [(True, 2)]

    def test_adaptive_inferer_reraises_non_oom(self):
        from factorizer_tpu.train import sliding_window as sw

        def bad_pred(w):
            raise ValueError("shape mismatch")

        inf = sw.SlidingWindowInfererAdapt((8, 8), sw_batch_size=2)
        with pytest.raises(ValueError, match="shape mismatch"):
            inf(jnp.zeros((1, 2, 8, 8)), bad_pred)


class TestTrainStep:
    def _tiny_model(self):
        return ftx.Factorizer(
            in_channels=2,
            out_channels=1,
            spatial_size=(8, 8, 8),
            encoder_depth=(1, 1),
            encoder_width=(4, 8),
            strides=(1, 2),
            decoder_depth=(1,),
            reshape=(ftx.SWMatricize, {"head_dim": 2, "patch_size": 4}),
            rank=1,
            num_iters=2,
            init_method="uniform",
            solver="hals",
            mlp_ratio=2,
        )

    def test_loss_decreases(self):
        model = self._tiny_model()
        x = jax.random.uniform(jax.random.key(0), (2, 2, 8, 8, 8))
        y = (jax.random.uniform(jax.random.key(1), (2, 1, 8, 8, 8)) > 0.5).astype(jnp.float32)
        tx = make_adamw(lr=1e-2)
        state = create_train_state(model, tx, x, jax.random.key(2), {"train": False})
        step = make_train_step(model)
        batch = {"image": x, "label": y}
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.key(10 + i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8

    def test_flat_optimizer_matches_per_leaf(self):
        """flat_opt=True (single raveled AdamW vector, the default) must match
        the per-leaf optimizer: AdamW is elementwise, so the only divergence
        allowed is XLA fusion-level rounding (~1 ulp)."""
        from factorizer_tpu.train.trainer import TrainState, init_opt_state

        model = self._tiny_model()
        x = jax.random.uniform(jax.random.key(0), (2, 2, 8, 8, 8))
        y = (jax.random.uniform(jax.random.key(1), (2, 1, 8, 8, 8)) > 0.5).astype(jnp.float32)
        variables = model.init(jax.random.key(2), x, train=False)
        tx = make_adamw(lr=1e-2)

        def mk(flat):
            return TrainState(
                step=jnp.zeros((), jnp.int32), params=variables["params"],
                buffers=variables.get("buffers", {}),
                opt_state=init_opt_state(tx, variables["params"], flat),
                tx=tx, flat_opt=flat,
            )

        step = make_train_step(model, donate=False)
        s_flat, s_leaf = mk(True), mk(False)
        for i in range(3):
            rng = jax.random.key(10 + i)
            s_flat, m_flat = step(s_flat, {"image": x, "label": y}, rng)
            s_leaf, m_leaf = step(s_leaf, {"image": x, "label": y}, rng)
        assert float(m_flat["loss"]) == pytest.approx(float(m_leaf["loss"]), abs=1e-6)
        assert float(m_flat["grad_norm"]) == pytest.approx(
            float(m_leaf["grad_norm"]), rel=1e-5
        )
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s_flat.params, s_leaf.params
        )
        assert max(jax.tree.leaves(diffs)) < 1e-6

    def test_data_parallel_mesh_step(self):
        """DP over the virtual multi-device mesh produces finite loss."""
        from factorizer_tpu.parallel.mesh import make_mesh

        n = min(len(jax.devices()), 4)
        if n < 2:
            pytest.skip("needs >=2 devices")
        mesh = make_mesh({"data": n})
        model = self._tiny_model()
        x = jax.random.uniform(jax.random.key(0), (n * 2, 2, 8, 8, 8))
        y = jnp.zeros((n * 2, 1, 8, 8, 8))
        tx = make_adamw(lr=1e-3)
        state = create_train_state(model, tx, x, jax.random.key(2), {"train": False})
        with mesh:
            step = make_train_step(model, mesh=mesh)
            state, metrics = step(state, {"image": x, "label": y}, jax.random.key(3))
        assert bool(jnp.isfinite(metrics["loss"]))


class TestGradAccumulation:
    def test_accumulated_step_matches_full_batch(self):
        """accum_steps=2 must produce the same loss and updated params as
        one full-batch step (mean-reduced losses; no dropout active)."""
        import factorizer_tpu as ftx
        from factorizer_tpu.train.trainer import TrainState, make_train_step

        import optax

        model = ftx.Factorizer(
            in_channels=2, out_channels=1, spatial_size=(8, 8, 8),
            encoder_depth=(1, 1), encoder_width=(4, 8), strides=(1, 2),
            decoder_depth=(1,),
            reshape=(ftx.SWMatricize, {"head_dim": 2, "patch_size": 4}),
            rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
        )
        x = jax.random.uniform(jax.random.key(0), (4, 2, 8, 8, 8))
        y = (jax.random.uniform(jax.random.key(1), (4, 1, 8, 8, 8)) > 0.5).astype(jnp.float32)
        variables = jax.jit(model.init)(jax.random.key(2), x)
        tx = optax.sgd(1e-2)

        def fresh_state():
            return TrainState(
                step=jnp.zeros((), jnp.int32), params=variables["params"],
                buffers=variables.get("buffers", {}),
                opt_state=tx.init(variables["params"]), tx=tx,
            )

        batch = {"image": x, "label": y}
        s1, m1 = make_train_step(model, donate=False)(fresh_state(), batch, jax.random.key(3))
        s2, m2 = make_train_step(model, donate=False, accum_steps=2)(
            fresh_state(), batch, jax.random.key(3)
        )
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_accumulation_under_data_parallel_mesh(self):
        """accum_steps under a dp mesh: microbatches stay batch-sharded and
        the result matches the full-batch sharded step."""
        import factorizer_tpu as ftx
        from factorizer_tpu.parallel.mesh import data_parallel_mesh
        from factorizer_tpu.train.trainer import TrainState, make_train_step

        import optax

        model = ftx.Factorizer(
            in_channels=2, out_channels=1, spatial_size=(8, 8, 8),
            encoder_depth=(1, 1), encoder_width=(4, 8), strides=(1, 2),
            decoder_depth=(1,),
            reshape=(ftx.SWMatricize, {"head_dim": 2, "patch_size": 4}),
            rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
        )
        x = jax.random.uniform(jax.random.key(0), (8, 2, 8, 8, 8))
        y = (jax.random.uniform(jax.random.key(1), (8, 1, 8, 8, 8)) > 0.5).astype(jnp.float32)
        variables = jax.jit(model.init)(jax.random.key(2), x)
        tx = optax.sgd(1e-2)

        def fresh_state():
            return TrainState(
                step=jnp.zeros((), jnp.int32), params=variables["params"],
                buffers=variables.get("buffers", {}),
                opt_state=tx.init(variables["params"]), tx=tx,
            )

        mesh = data_parallel_mesh(4)
        batch = {"image": x, "label": y}
        with mesh:
            s1, m1 = make_train_step(model, mesh=mesh, donate=False)(
                fresh_state(), batch, jax.random.key(3)
            )
            s2, m2 = make_train_step(model, mesh=mesh, donate=False, accum_steps=2)(
                fresh_state(), batch, jax.random.key(3)
            )
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from factorizer_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

        tree = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7),
        }
        save_checkpoint(tmp_path / "ckpt", tree)
        restored = restore_checkpoint(tmp_path / "ckpt", template=tree)
        np.testing.assert_array_equal(restored["params"]["w"], np.arange(6.0).reshape(2, 3))
        assert int(restored["step"]) == 7

    def test_async_save_is_durable_after_wait(self, tmp_path):
        """block=False overlaps the disk write; wait()/latest_step() must
        make it durable and visible."""
        from factorizer_tpu.train.checkpoint import CheckpointManager

        tree = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(3)}
        mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
        mgr.save(1, tree, block=False)
        mgr.save(2, tree, block=False)
        assert mgr.latest_step() == 2  # waits for in-flight saves
        restored = mgr.restore(template=tree)
        np.testing.assert_array_equal(restored["params"]["w"], np.arange(4.0))
        mgr.close()

    def test_best_metric_retention(self, tmp_path):
        """best_metric_key retains the max_to_keep highest-metric steps."""
        from factorizer_tpu.train.checkpoint import CheckpointManager

        tree = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(0)}
        mgr = CheckpointManager(tmp_path / "ck", max_to_keep=1,
                                best_metric_key="mean_dice")
        mgr.save(1, tree, metrics={"mean_dice": 0.5})
        mgr.save(2, tree, metrics={"mean_dice": 0.9})
        mgr.save(3, tree, metrics={"mean_dice": 0.7})
        mgr.wait()
        assert mgr.latest_step() == 2  # the best, not the last
        assert mgr.best_saved_metric("mean_dice") == pytest.approx(0.9)
        assert mgr.best_saved_metric("missing_key") is None
        mgr.close()


class TestResume:
    def test_trainer_resumes_from_checkpoint(self, tmp_path):
        """Failure recovery: a new trainer picks up where the last one stopped."""
        import numpy as np

        import factorizer_tpu as ftx
        from factorizer_tpu.data import DataLoader, Dataset
        from factorizer_tpu.train.loop import SegmentationTrainer

        rng = np.random.default_rng(0)
        data = [
            {
                "image": rng.random((2, 8, 8, 8), dtype=np.float32),
                "label": (rng.random((1, 8, 8, 8)) > 0.5).astype(np.float32),
            }
            for _ in range(2)
        ]
        loader = DataLoader(Dataset(data), batch_size=2, num_workers=0)
        model = ftx.Factorizer(
            in_channels=2, out_channels=1, spatial_size=(8, 8, 8),
            encoder_depth=(1, 1), encoder_width=(4, 8), strides=(1, 2),
            decoder_depth=(1,),
            reshape=(ftx.SWMatricize, {"head_dim": 2, "patch_size": 4}),
            rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
        )

        t1 = SegmentationTrainer(
            model, loader, max_epochs=2, val_interval=0, ckpt_dir=str(tmp_path / "ck"),
        )
        state1 = t1.run()
        assert int(state1.step) == 2
        t1.ckpt.close()

        t2 = SegmentationTrainer(
            model, loader, max_epochs=2, val_interval=0, ckpt_dir=str(tmp_path / "ck"),
        )
        state2 = t2.initialize()
        assert int(state2.step) == 2  # resumed
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(state2.params)[0]),
            np.asarray(jax.tree.leaves(state1.params)[0]),
        )
        t2.ckpt.close()

    def test_resume_restores_best_metric(self, tmp_path):
        """A resumed trainer recovers its best-validation watermark from the
        checkpoint metrics instead of resetting to -inf."""
        import numpy as np

        import factorizer_tpu as ftx
        from factorizer_tpu.data import DataLoader, Dataset
        from factorizer_tpu.train.loop import SegmentationTrainer

        rng = np.random.default_rng(0)
        data = [
            {
                "image": rng.random((2, 8, 8, 8), dtype=np.float32),
                "label": (rng.random((1, 8, 8, 8)) > 0.5).astype(np.float32),
            }
            for _ in range(2)
        ]
        loader = DataLoader(Dataset(data), batch_size=2, num_workers=0)
        model = ftx.Factorizer(
            in_channels=2, out_channels=1, spatial_size=(8, 8, 8),
            encoder_depth=(1, 1), encoder_width=(4, 8), strides=(1, 2),
            decoder_depth=(1,),
            reshape=(ftx.SWMatricize, {"head_dim": 2, "patch_size": 4}),
            rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
        )

        t1 = SegmentationTrainer(
            model, loader, val_loader=loader, max_epochs=1, val_interval=1,
            roi_size=(8, 8, 8), ckpt_dir=str(tmp_path / "ck"),
        )
        t1.run()
        best1 = t1.best_metric
        assert np.isfinite(best1)
        t1.ckpt.close()

        t2 = SegmentationTrainer(
            model, loader, val_loader=loader, max_epochs=1, val_interval=1,
            roi_size=(8, 8, 8), ckpt_dir=str(tmp_path / "ck"),
        )
        t2.initialize()
        assert t2.best_metric == pytest.approx(best1)
        t2.ckpt.close()


def test_training_is_deterministic():
    """Same seeds -> bitwise-identical params after 2 steps (the TPU analogue
    of the reference's determinism seeding, train.yaml:378)."""
    import factorizer_tpu as ftx
    from factorizer_tpu.train import make_adamw
    from factorizer_tpu.train.trainer import create_train_state, make_train_step

    model = ftx.Factorizer(
        in_channels=2, out_channels=1, spatial_size=(8, 8, 8),
        encoder_depth=(1, 1), encoder_width=(4, 8), strides=(1, 2), decoder_depth=(1,),
        reshape=(ftx.SWMatricize, {"head_dim": 2, "patch_size": 4}),
        rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
    )
    x = jax.random.uniform(jax.random.key(0), (2, 2, 8, 8, 8))
    y = jnp.zeros((2, 1, 8, 8, 8))

    def run():
        tx = make_adamw(lr=1e-3)
        state = create_train_state(model, tx, x, jax.random.key(5), {"train": False})
        step = make_train_step(model, donate=False)
        for i in range(2):
            state, _ = step(state, {"image": x, "label": y}, jax.random.key(100 + i))
        return state.params

    p1, p2 = run(), run()
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestObservability:
    def test_validation_image_panels_written(self, tmp_path):
        """The TensorBoardImageHandler analogue writes image/label/pred
        panels (reference train.yaml:296-300)."""
        pytest.importorskip("tensorboardX")
        from tensorboardX import SummaryWriter

        from factorizer_tpu.train.observability import log_validation_images

        w = SummaryWriter(str(tmp_path))
        imgs = np.random.rand(2, 2, 8, 8, 8).astype(np.float32)
        labels = (np.random.rand(2, 1, 8, 8, 8) > 0.5).astype(np.uint8)
        preds = (np.random.rand(2, 1, 8, 8, 8) > 0.5).astype(np.uint8)
        log_validation_images(w, imgs, labels, preds, step=3)
        w.close()
        events = list(tmp_path.glob("events.out.tfevents.*"))
        assert events and events[0].stat().st_size > 500

    def test_write_metrics_reports_columns(self, tmp_path):
        from factorizer_tpu.train.observability import write_metrics_reports

        vals = np.array([[0.9, 0.8, np.nan], [0.7, 0.6, 0.5]])
        files = write_metrics_reports(
            tmp_path, ["caseA", "caseB"], {"dice": vals}, {"mean_dice": 0.7}
        )
        raw = (tmp_path / "dice_raw.csv").read_text().splitlines()
        assert raw[0] == "filename,class0,class1,class2,mean"
        assert raw[1].split(",")[0] == "caseA"
        summ = (tmp_path / "dice_summary.csv").read_text().splitlines()
        assert summ[0] == "class,mean,median,max,min,90percentile,std"
        assert len(summ) == 5  # header + 3 classes + overall mean row
        assert len(files) == 3


class TestRemat:
    def test_remat_matches_baseline_forward_and_grad(self):
        """remat=True trades FLOPs for memory without changing numerics."""
        import factorizer_tpu as ftx

        kw = dict(
            in_channels=1, out_channels=1, spatial_size=(16, 16, 16),
            encoder_depth=(1, 1), encoder_width=(8, 16), strides=(1, 2),
            decoder_depth=(1,),
            reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
            rank=1, num_iters=2, init_method="uniform", solver="hals",
            mlp_ratio=2,
        )
        m0 = ftx.Factorizer(**kw)
        m1 = ftx.Factorizer(**kw, remat=True)
        x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16, 16))
        variables = jax.jit(m0.init)(jax.random.key(1), x)
        y0 = jax.jit(m0.apply)(variables, x)
        y1 = jax.jit(m1.apply)(variables, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

        def loss(m, v):
            return jnp.mean(m.apply(v, x) ** 2)

        g0 = jax.jit(jax.grad(lambda v: loss(m0, v)))(variables)
        g1 = jax.jit(jax.grad(lambda v: loss(m1, v)))(variables)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
