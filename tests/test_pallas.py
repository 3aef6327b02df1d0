"""Fused Pallas NMF kernel: correctness vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from factorizer_tpu.ops.pallas.nmf_kernel import (
    nmf_reconstruct,
    supports,
    xla_nmf_reconstruct,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((6, 5, 8, 32), dtype=np.float32))
    u0 = jnp.asarray(rng.random((8, 1), dtype=np.float32))
    v0 = jnp.asarray(rng.random((32, 1), dtype=np.float32))
    return x, u0, v0


@pytest.mark.parametrize("solver", ["hals", "mu"])
def test_forward_matches_xla(data, solver):
    x, u0, v0 = data
    y_k = jax.jit(lambda x: nmf_reconstruct(x, u0, v0, solver, 5))(x)
    y_x = xla_nmf_reconstruct(x, u0, v0, solver, 5)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), atol=2e-5)


def test_rank2_matches_xla(data):
    x, _, _ = data
    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.random((8, 2), dtype=np.float32))
    v0 = jnp.asarray(rng.random((32, 2), dtype=np.float32))
    y_k = jax.jit(lambda x: nmf_reconstruct(x, u0, v0, "hals", 3))(x)
    y_x = xla_nmf_reconstruct(x, u0, v0, "hals", 3)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), atol=2e-5)


def test_gradient_matches_xla(data):
    x, u0, v0 = data
    g_k = jax.jit(jax.grad(lambda x: nmf_reconstruct(x, u0, v0, "hals", 3).sum()))(x)
    g_x = jax.grad(lambda x: xla_nmf_reconstruct(x, u0, v0, "hals", 3).sum())(x)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x), atol=2e-4)


def test_gradient_truncation_semantics(data):
    """num_grad_steps=0 makes the kernel output constant w.r.t. x."""
    x, u0, v0 = data
    g = jax.jit(
        jax.grad(lambda x: nmf_reconstruct(x, u0, v0, "hals", 3, 1e-16, 0).sum())
    )(x)
    assert float(jnp.abs(g).max()) == 0.0


def test_bf16_input_supported(data):
    x, u0, v0 = data
    y = jax.jit(lambda x: nmf_reconstruct(x.astype(jnp.bfloat16), u0, v0, "hals", 3))(x)
    assert y.dtype == jnp.bfloat16
    y_x = xla_nmf_reconstruct(x, u0, v0, "hals", 3)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_x), atol=0.05, rtol=0.05
    )


def test_supports_predicate():
    assert supports("hals", 1, (8, 512))
    assert supports("mu", 4, (8, 512))
    assert not supports("ls", 1, (8, 512))
    assert not supports("hals", 9, (8, 512))


def test_nonuniform_batch_padding():
    """n_mats not divisible by the tile -> pad path is exercised."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((7, 8, 32), dtype=np.float32))  # 7 matrices
    u0 = jnp.asarray(rng.random((8, 1), dtype=np.float32))
    v0 = jnp.asarray(rng.random((32, 1), dtype=np.float32))
    y_k = jax.jit(lambda x: nmf_reconstruct(x, u0, v0, "hals", 2))(x)
    y_x = xla_nmf_reconstruct(x, u0, v0, "hals", 2)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), atol=2e-5)


class TestWindowedKernel:
    """Fused fold->solve->unfold kernel vs the explicit composition."""

    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((2, 16, 16, 16, 8), dtype=np.float32))
        u0 = jnp.asarray(rng.random((4, 1), dtype=np.float32))
        v0 = jnp.asarray(rng.random((64, 1), dtype=np.float32))
        return x, u0, v0

    def test_matches_fold_solve_unfold(self, data):
        import factorizer_tpu as ftx
        from factorizer_tpu.ops.pallas.windowed_nmf_kernel import windowed_nmf_reconstruct

        x, u0, v0 = data
        y_fused = jax.jit(lambda x: windowed_nmf_reconstruct(x, u0, v0, 4, 4, "hals", 3))(x)
        m = ftx.Matricize((None, 16, 16, 16, 8), head_dim=4, patch_size=4,
                          data_format="channels_last")
        y_ref = m.inverse_forward(nmf_reconstruct(m(x), u0, v0, "hals", 3))
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=2e-5)

    def test_gradient_matches(self, data):
        from factorizer_tpu.ops.pallas.windowed_nmf_kernel import (
            windowed_nmf_reconstruct,
            xla_windowed_nmf_reconstruct,
        )

        x, u0, v0 = data
        g1 = jax.jit(
            jax.grad(lambda x: windowed_nmf_reconstruct(x, u0, v0, 4, 4, "hals", 2).sum())
        )(x)
        g2 = jax.grad(
            lambda x: xla_windowed_nmf_reconstruct(x, u0, v0, 4, 4, "hals", 2).sum()
        )(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)

    def test_factmixer_fused_path_equivalence(self, data):
        """The FactMixer fused-windowed path equals the explicit path."""
        import factorizer_tpu as ftx

        kw = dict(
            channels=8, spatial_size=(16, 16, 16),
            reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
            rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
        )
        blk_fused = ftx.FactorizerBlock(
            **kw, factorize_options={"use_pallas": True, "use_windowed": True}
        )
        blk_plain = ftx.FactorizerBlock(**kw, factorize_options={"use_pallas": False})
        x = jax.random.uniform(jax.random.key(0), (1, 16, 16, 16, 8))
        variables = jax.jit(blk_fused.init)(jax.random.key(1), x)
        y_f = jax.jit(blk_fused.apply)(variables, x)
        y_p = jax.jit(blk_plain.apply)(variables, x)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p), atol=1e-4)


def test_split_shifts_option_equivalence():
    """The opt-in per-shift mixer path is bitwise equal to the concat path."""
    import factorizer_tpu as ftx

    kw = dict(
        channels=8, spatial_size=(16, 16, 16),
        reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
        rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
    )
    blk_split = ftx.FactorizerBlock(**kw, factorize_options={"split_shifts": True})
    blk_plain = ftx.FactorizerBlock(**kw)
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 16, 8))
    variables = jax.jit(blk_split.init)(jax.random.key(1), x)
    y_s = jax.jit(blk_split.apply)(variables, x)
    y_p = jax.jit(blk_plain.apply)(variables, x)
    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_p))


def test_lane_packed_config_matches_xla():
    """A config where lane packing engages (C=32, S=32, p=8 -> pack 4):
    packed field solve and its gradient must equal the explicit
    fold/solve/unfold composition."""
    from factorizer_tpu.ops.pallas.windowed_nmf_kernel import (
        _pick_pack,
        windowed_nmf_multi,
        xla_windowed_nmf_reconstruct,
    )

    assert _pick_pack(32, 4, 32) == 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 32, 32, 32, 32), dtype=np.float32))
    u0 = jnp.asarray(rng.random((8, 1), dtype=np.float32))
    v0 = jnp.asarray(rng.random((512, 1), dtype=np.float32))

    def xla_multi(x, shifts):
        acc = None
        for s in shifts:
            xs = jnp.roll(x, (s, s, s), (1, 2, 3)) if s else x
            ys = xla_windowed_nmf_reconstruct(xs, u0, v0, 8, 8, "hals", 2)
            if s:
                ys = jnp.roll(ys, (-s, -s, -s), (1, 2, 3))
            acc = ys if acc is None else acc + ys
        return acc / len(shifts)

    shifts = (None, 2)
    y = jax.jit(lambda x: windowed_nmf_multi(x, u0, v0, 8, 8, shifts, "hals", 2))(x)
    y_ref = xla_multi(x, shifts)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)

    g = jax.jit(
        jax.grad(lambda x: (windowed_nmf_multi(x, u0, v0, 8, 8, shifts, "hals", 2) ** 2).sum())
    )(x)
    g_ref = jax.grad(lambda x: (xla_multi(x, shifts) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)


@pytest.mark.parametrize(
    "shape,d,p",
    [
        ((1, 16, 16, 16, 24), 8, 4),   # 3 heads (non-power-of-two C)
        ((2, 8, 16, 24, 8), 4, 4),     # non-cubic spatial, B=2
        ((1, 8, 8, 8, 16), 16, 8),     # single window, head_dim == C
        ((1, 16, 16, 16, 4), 1, 4),    # head_dim 1
        ((1, 8, 8, 64, 16), 8, 4),     # max lane packing (pack=8 at C=16)
    ],
)
def test_windowed_multi_edge_shapes(shape, d, p):
    """Irregular head counts / aspect ratios through the fused path."""
    from factorizer_tpu.ops.pallas.windowed_nmf_kernel import (
        windowed_nmf_multi,
        xla_windowed_nmf_reconstruct,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    u0 = jnp.asarray(rng.random((d, 1), dtype=np.float32))
    v0 = jnp.asarray(rng.random((p**3, 1), dtype=np.float32))
    shifts = (None, p // 2)
    y = jax.jit(lambda x: windowed_nmf_multi(x, u0, v0, d, p, shifts, "hals", 2))(x)

    def ref(x):
        acc = None
        for s in shifts:
            t = (s, s, s) if s else None
            xs = jnp.roll(x, t, (1, 2, 3)) if t else x
            ys = xla_windowed_nmf_reconstruct(xs, u0, v0, d, p, "hals", 2)
            if t:
                ys = jnp.roll(ys, tuple(-v for v in t), (1, 2, 3))
            acc = ys if acc is None else acc + ys
        return acc / len(shifts)

    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x)), atol=2e-5)


@pytest.mark.parametrize("s3,c,pack", [(32, 32, 4), (64, 16, 8), (16, 64, 2), (32, 32, 1)])
def test_roll3_packed_xla_matches_natural_roll(s3, c, pack):
    """The packed-view dim-3 roll equals jnp.roll in the natural view for
    every shift (incl. the negative inverse shifts the callers use)."""
    from factorizer_tpu.ops.pallas.windowed_nmf_kernel import (
        _pack_lanes,
        _roll3_packed_xla,
        _unpack_lanes_xla,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, 3, s3, c), dtype=np.float32))
    xp = _pack_lanes(x, pack)
    for r in (-7, -1, 0, 1, 5, s3 - 1, -s3, 13):
        want = jnp.roll(x, r, axis=-2)
        got = _unpack_lanes_xla(_roll3_packed_xla(xp, r, pack, c), pack, c)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
