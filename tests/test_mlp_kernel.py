"""Fused pre-norm MLP residual kernel: parity, gating, and sharding.

The kernel fuses ``x + fc2(gelu(fc1(LN(x))))`` (reference: factorizer.py:60-77
and layers/mlp.py:10-63 — the tail of both flagship block families) into one
Pallas pass.  Tests run in interpret mode on CPU against the unfused XLA
chain, the same oracle the models fall back to.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import factorizer_tpu as ftx
from factorizer_tpu.ops.pallas.mlp_block import (
    fused_prenorm_mlp,
    supports_fused_mlp,
)
from factorizer_tpu.parallel.mesh import make_mesh

C, H = 32, 128
DT = jnp.bfloat16
EPS = 1e-5


def _make_inputs(shape=(2, 8, 8, 8), seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (*shape, C), DT) * 2 + 0.5
    gamma = jax.random.normal(ks[1], (C,), jnp.float32) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (C, H), jnp.float32) * 0.2
    b1 = jax.random.normal(ks[4], (H,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[5], (H, C), jnp.float32) * 0.2
    b2 = jax.random.normal(ks[6], (C,), jnp.float32) * 0.1
    return x, (gamma, beta, w1, b1, w2, b2)


def _ref(x, gamma, beta, w1, b1, w2, b2):
    """The unfused XLA chain with the models' exact dtype policy."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + EPS) * gamma + beta).astype(DT)
    h = xn @ w1.astype(DT) + b1.astype(DT)
    g = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(DT)
    return x + (g @ w2.astype(DT) + b2.astype(DT))


def test_supports_predicate():
    assert supports_fused_mlp((2, 8, 8, 8, 32), 128, jnp.bfloat16)
    assert supports_fused_mlp((4, 16, 16, 16, 8), 16, jnp.bfloat16)
    assert not supports_fused_mlp((2, 8, 8, 8, 32), 128, jnp.float32)  # f32
    assert not supports_fused_mlp((2, 8, 8, 8, 48), 96, jnp.bfloat16)  # 128 % C
    assert not supports_fused_mlp((2, 8, 8, 8, 256), 512, jnp.bfloat16)  # C>128
    assert not supports_fused_mlp((2, 8, 8, 8, 32), 512, jnp.bfloat16)  # ph>1024
    assert not supports_fused_mlp((3, 32), 128, jnp.bfloat16)  # tokens%pack
    assert not supports_fused_mlp((2, 8, 8, 8, 32), 128, jnp.bfloat16, 0.1)


def test_forward_matches_unfused():
    x, params = _make_inputs()
    y0 = np.asarray(_ref(x, *params), np.float32)
    y1 = np.asarray(fused_prenorm_mlp(x, *params, eps=EPS), np.float32)
    # bf16 activation quantization: a few ulps at |y| ~ 4.
    np.testing.assert_allclose(y1, y0, atol=0.07)


def _ref_f32(x, gamma, beta, w1, b1, w2, b2):
    """Full-precision oracle (no bf16 rounding anywhere)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + EPS) * gamma + beta
    h = xn @ w1 + b1
    g = jax.nn.gelu(h, approximate=False)
    return xf + (g @ w2 + b2)


def test_gradients_match_unfused():
    """Parameter cotangents are sums of bf16-rounded per-token terms, so the
    fused and unfused paths random-walk apart ~ sqrt(tokens) * ulp.  The
    decidable check: the fused kernel's deviation from the full-f32 oracle
    must be no worse than the unfused bf16 chain's own deviation."""
    x, params = _make_inputs()

    def loss(fn, x, params):
        y = fn(x, *params).astype(jnp.float32)
        return jnp.mean(y * jnp.cos(y))  # non-trivial cotangent

    g_oracle = jax.grad(lambda x, p: loss(_ref_f32, x, p), argnums=(0, 1))(x, params)
    g_unfused = jax.grad(lambda x, p: loss(_ref, x, p), argnums=(0, 1))(x, params)
    g_fused = jax.grad(
        lambda x, p: loss(lambda *a: fused_prenorm_mlp(*a, eps=EPS), x, p),
        argnums=(0, 1),
    )(x, params)
    for o, u, f in zip(
        jax.tree.leaves(g_oracle), jax.tree.leaves(g_unfused), jax.tree.leaves(g_fused)
    ):
        o = np.asarray(o, np.float64)
        scale = max(np.abs(o).max(), 1e-3)
        err_u = np.abs(np.asarray(u, np.float64) - o).max() / scale
        err_f = np.abs(np.asarray(f, np.float64) - o).max() / scale
        assert err_f <= max(3.0 * err_u, 0.02), (err_f, err_u)


def test_forward_2d_tokens():
    """Non-volume leading shape (e.g. (B, HW, C)) packs the same way."""
    x, params = _make_inputs(shape=(4, 64))
    y0 = np.asarray(_ref(x, *params), np.float32)
    y1 = np.asarray(fused_prenorm_mlp(x, *params, eps=EPS), np.float32)
    np.testing.assert_allclose(y1, y0, atol=0.07)


def test_layout_selection():
    from factorizer_tpu.ops.pallas.mlp_block import preferred_layout

    # minor spatial axis == 128 -> slab (bitcast into XLA's transposed layout)
    assert preferred_layout((2, 8, 8, 128, 32), 128, jnp.bfloat16) == "slab"
    assert preferred_layout((1, 128, 128, 128, 64), 192, jnp.bfloat16) == "slab"
    # otherwise the lane-packed flat layout
    assert preferred_layout((2, 8, 8, 8, 32), 128, jnp.bfloat16) == "flat"
    assert preferred_layout((4, 64, 32), 96, jnp.bfloat16) == "flat"


def test_slab_forward_and_gradients_match_oracle():
    """Slab layout (channels on sublanes): same oracle comparison as the
    flat-layout gradient test."""
    x, params = _make_inputs(shape=(2, 2, 128))
    from factorizer_tpu.ops.pallas.mlp_block import preferred_layout

    assert preferred_layout(x.shape, H, x.dtype) == "slab"
    y0 = np.asarray(_ref(x, *params), np.float32)
    y1 = np.asarray(fused_prenorm_mlp(x, *params, eps=EPS), np.float32)
    np.testing.assert_allclose(y1, y0, atol=0.07)

    def loss(fn, x, params):
        y = fn(x, *params).astype(jnp.float32)
        return jnp.mean(y * jnp.cos(y))

    g_oracle = jax.grad(lambda x, p: loss(_ref_f32, x, p), argnums=(0, 1))(x, params)
    g_unfused = jax.grad(lambda x, p: loss(_ref, x, p), argnums=(0, 1))(x, params)
    g_fused = jax.grad(
        lambda x, p: loss(lambda *a: fused_prenorm_mlp(*a, eps=EPS), x, p),
        argnums=(0, 1),
    )(x, params)
    for o, u, f in zip(
        jax.tree.leaves(g_oracle), jax.tree.leaves(g_unfused), jax.tree.leaves(g_fused)
    ):
        o = np.asarray(o, np.float64)
        scale = max(np.abs(o).max(), 1e-3)
        err_u = np.abs(np.asarray(u, np.float64) - o).max() / scale
        err_f = np.abs(np.asarray(f, np.float64) - o).max() / scale
        assert err_f <= max(3.0 * err_u, 0.02), (err_f, err_u)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
class TestSharded:
    """Batch-sharded execution must match single-device (custom_partitioning
    keeps the kernel local per shard; parameter cotangents psum over the
    batch axes — the TPU-native analogue of DDP's gradient all-reduce)."""

    @pytest.fixture(scope="class")
    def data(self):
        x, params = _make_inputs(shape=(8, 4, 4, 4))
        y_single = np.asarray(
            jax.jit(lambda x: fused_prenorm_mlp(x, *params, eps=EPS))(x),
            np.float32,
        )

        def loss(params, x):
            y = fused_prenorm_mlp(x, *params, eps=EPS).astype(jnp.float32)
            return jnp.mean(y * y)

        g_single = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
        return x, params, y_single, g_single, loss

    def test_forward_matches_single_device(self, data):
        x, params, y_single, _, _ = data
        mesh = make_mesh({"data": 4})
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            y = jax.jit(lambda x: fused_prenorm_mlp(x, *params, eps=EPS))(xs)
        np.testing.assert_allclose(np.asarray(y, np.float32), y_single, atol=1e-5)

    def test_gradient_matches_single_device(self, data):
        x, params, _, g_single, loss = data
        mesh = make_mesh({"data": 4})
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            g = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, xs)
        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32), atol=2e-4
            )

    def test_slab_layout_sharded_matches_single_device(self):
        """The slab kernel has its own partitioning rule (different operand
        shapes); exercise forward + gradient on a batch-sharded mesh."""
        x, params = _make_inputs(shape=(8, 2, 128))
        from factorizer_tpu.ops.pallas.mlp_block import preferred_layout

        assert preferred_layout(x.shape, H, x.dtype) == "slab"

        def loss(params, x):
            y = fused_prenorm_mlp(x, *params, eps=EPS).astype(jnp.float32)
            return jnp.mean(y * y)

        y_single = np.asarray(
            jax.jit(lambda x: fused_prenorm_mlp(x, *params, eps=EPS))(x), np.float32
        )
        g_single = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
        mesh = make_mesh({"data": 4})
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            y = jax.jit(lambda x: fused_prenorm_mlp(x, *params, eps=EPS))(xs)
            g = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, xs)
        np.testing.assert_allclose(np.asarray(y, np.float32), y_single, atol=1e-5)
        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32), atol=2e-4
            )


class TestBlockIntegration:
    """FactorizerBlock / DeconverBlock route through the fused path when
    forced (FTX_FUSED_MLP=force) and produce the same outputs and gradients
    as the unfused module chain (FTX_FUSED_MLP=0), with an identical
    parameter tree (checkpoint compatibility)."""

    def _build(self, family, dtype):
        if family == "factorizer":
            return ftx.FactorizerBlock(
                channels=8,
                spatial_size=(16, 16, 16),
                reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
                rank=1,
                num_iters=2,
                init_method="uniform",
                solver="hals",
                mlp_ratio=2,
                dtype=dtype,
            )
        return ftx.DeconverBlock(
            channels=8,
            kernel_size=(3, 3, 3),
            groups=4,
            num_iters=1,
            mlp_ratio=2,
            dtype=dtype,
        )

    def _run(self, blk, x, mode, monkeypatch):
        monkeypatch.setenv("FTX_FUSED_MLP", mode)
        variables = jax.jit(blk.init)(jax.random.key(1), x)

        def loss(v, x):
            return jnp.mean(blk.apply(v, x).astype(jnp.float32) ** 2)

        y = blk.apply(variables, x)
        g = jax.jit(jax.grad(loss))(variables, x)
        return variables, np.asarray(y, np.float32), g

    @pytest.mark.parametrize("family", ["factorizer", "deconver"])
    def test_fused_matches_unfused(self, family, monkeypatch):
        """Fused and unfused bf16 paths agree on outputs; gradients are
        judged against an f32-model oracle because the unfused chain's own
        bias cotangents are reduced in bf16 by XLA (its error is the yard-
        stick, and the f32-accumulating kernel is typically *closer*)."""
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 16, 8), jnp.bfloat16)
        _, _, g_oracle = self._run(
            self._build(family, jnp.float32), x.astype(jnp.float32), "0", monkeypatch
        )
        blk = self._build(family, jnp.bfloat16)
        v0, y0, g0 = self._run(blk, x, "0", monkeypatch)
        v1, y1, g1 = self._run(blk, x, "force", monkeypatch)
        assert jax.tree.structure(v0) == jax.tree.structure(v1)
        np.testing.assert_allclose(y1, y0, atol=0.08)
        for o, u, f in zip(
            jax.tree.leaves(g_oracle), jax.tree.leaves(g0), jax.tree.leaves(g1)
        ):
            o = np.asarray(o, np.float64)
            scale = max(np.abs(o).max(), 1e-3)
            err_u = np.abs(np.asarray(u, np.float64) - o).max() / scale
            err_f = np.abs(np.asarray(f, np.float64) - o).max() / scale
            assert err_f <= max(3.0 * err_u, 0.03), (err_f, err_u)

    def test_fallback_reason_logged(self, caplog, monkeypatch):
        """A close-but-ineligible config (f32 dtype) logs its reason once."""
        import logging

        from factorizer_tpu.layers import basic as basic_mod

        monkeypatch.setenv("FTX_FUSED_MLP", "force")
        monkeypatch.setattr(basic_mod, "_FUSED_MLP_LOGGED", set())
        blk = ftx.DeconverBlock(
            channels=8, kernel_size=(3, 3, 3), groups=4, num_iters=1,
            mlp_ratio=2, dtype=jnp.bfloat16,
        )
        # odd token count -> shape gate rejects; bf16 so the notice fires
        x = jax.random.normal(jax.random.key(0), (1, 3, 3, 3, 8), jnp.bfloat16)
        variables = jax.jit(blk.init)(jax.random.key(1), x)
        with caplog.at_level(logging.INFO, logger="factorizer_tpu.layers.basic"):
            blk.apply(variables, x)
        assert any("unfused XLA chain" in r.message for r in caplog.records)
