"""Pallas depthwise-conv3d kernel == lax grouped conv (fwd + VJP).

The kernel (ops/pallas/depthwise_conv.py) serves the Deconver bundle config
``groups: -1`` (depthwise multiplicative updates — reference:
factorizer/factorization/deconvolution.py:21-49).  On CPU these tests run
the kernel in interpret mode via its impl functions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from factorizer_tpu.ops.pallas.depthwise_conv import (
    _dw_impl,
    _fwd_impl,
    _flip_taps,
    depthwise_conv3d,
    supports_depthwise,
)


def _lax_depthwise(x, w, ks):
    # w (B, taps, C) -> rhs (*k, 1, C) per batch item, feature_group_count=C
    B, _, c = w.shape
    p = len(ks)

    def one(x1, w1):
        rhs = w1.reshape(*ks, c)[..., None, :]
        return jax.lax.conv_general_dilated(
            x1[None], rhs, (1,) * p, [(k // 2, k // 2) for k in ks],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )[0]

    return jax.vmap(one)(x, w)


@pytest.mark.parametrize("shape,ks", [
    ((1, 8, 8, 8, 8), (3, 3, 3)),
    ((2, 16, 8, 8, 4), (3, 3, 3)),
    ((1, 8, 8, 16, 8), (1, 3, 3)),
    ((1, 8, 8, 8, 8), (3, 1, 1)),
])
def test_forward_matches_lax(shape, ks):
    assert supports_depthwise(shape, ks)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    w = jnp.asarray(rs.randn(shape[0], int(np.prod(ks)), shape[-1]), jnp.float32)
    y = _fwd_impl(x, w, ks)
    y_ref = _lax_depthwise(x, w, ks)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_vjp_matches_lax():
    ks = (3, 3, 3)
    shape = (2, 8, 8, 8, 4)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    w = jnp.asarray(rs.randn(2, 27, 4), jnp.float32)
    g = jnp.asarray(rs.randn(*shape), jnp.float32)

    # reference cotangents through the lax formulation
    y_ref, vjp_ref = jax.vjp(lambda x, w: _lax_depthwise(x, w, ks), x, w)
    dx_ref, dw_ref = vjp_ref(g)

    dx = _fwd_impl(g, _flip_taps(w, ks), ks)
    dw = _dw_impl(x, g, ks)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=1e-3, rtol=1e-4)


def test_custom_vjp_wires_through():
    ks = (3, 3, 3)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rs.randn(1, 27, 4), jnp.float32)

    def f(x, w):
        return jnp.sum(depthwise_conv3d(x, w, ks) ** 2)

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)

    def f_ref(x, w):
        return jnp.sum(_lax_depthwise(x, w, ks) ** 2)

    gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=1e-3, rtol=1e-4)


# ---- lane-packed v2 (ops/pallas/depthwise_packed.py), the default TPU path

from factorizer_tpu.ops.pallas import depthwise_packed as dpk


@pytest.mark.parametrize("shape,ks", [
    ((1, 8, 8, 8, 16), (3, 3, 3)),     # pack=8, rows=1
    ((2, 8, 8, 16, 32), (3, 3, 3)),    # pack=4, rows=4, batch>1
])
def test_packed_forward_matches_lax(shape, ks):
    assert dpk.supports_packed(shape, ks)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    w = jnp.asarray(rs.randn(shape[0], int(np.prod(ks)), shape[-1]), jnp.float32)
    y = dpk._fwd_impl(x, w, ks)
    y_ref = _lax_depthwise(x, w, ks)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_packed_vjp_matches_lax():
    ks = (3, 3, 3)
    shape = (1, 8, 8, 16, 32)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    w = jnp.asarray(rs.randn(1, 27, 32), jnp.float32)
    g = jnp.asarray(rs.randn(*shape), jnp.float32)

    y_ref, vjp_ref = jax.vjp(lambda x, w: _lax_depthwise(x, w, ks), x, w)
    dx_ref, dw_ref = vjp_ref(g)

    dx = dpk._fwd_impl(g, dpk._flip_taps(w, ks), ks)
    dw = dpk._dw_impl(x, g, ks)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=1e-3, rtol=1e-4)


def _lax_depthwise_2d(x, w, ks):
    # HIGHEST precision: on TPU the default conv precision is bf16, which
    # would make the f32 Pallas kernel look ~3e-2 off when it is in fact
    # the *more* accurate side (chip-measured 1e-6 vs HIGHEST).
    B, _, c = w.shape

    def one(x1, w1):
        rhs = w1.reshape(*ks, c)[..., None, :]
        return jax.lax.conv_general_dilated(
            x1[None], rhs, (1, 1), [(k // 2, k // 2) for k in ks],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )[0]

    return jax.vmap(one)(x, w)


@pytest.mark.parametrize("shape,ks", [
    ((1, 8, 16, 32), (3, 3)),    # pack=4, rows=4
    ((2, 12, 16, 16), (5, 3)),   # rectangular bs=(4,16), pack=8, batch>1
    ((1, 16, 8, 16), (7, 7)),    # FIVES-like kernel, rows=1
])
def test_packed_2d_forward_matches_lax(shape, ks):
    assert dpk.supports_packed_2d(shape, ks)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    w = jnp.asarray(rs.randn(shape[0], int(np.prod(ks)), shape[-1]), jnp.float32)
    y = dpk.depthwise_conv2d_packed(x, w, ks)
    y_ref = _lax_depthwise_2d(x, w, ks)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_packed_2d_vjp_matches_lax():
    ks = (3, 3)
    shape = (2, 8, 16, 32)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    w = jnp.asarray(rs.randn(2, 9, 32), jnp.float32)

    def f(x, w):
        return jnp.sum(dpk.depthwise_conv2d_packed(x, w, ks) ** 2)

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)

    def f_ref(x, w):
        return jnp.sum(_lax_depthwise_2d(x, w, ks) ** 2)

    gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=1e-3, rtol=1e-4)


def test_packed_2d_eligibility():
    ok = dpk.supports_packed_2d
    assert ok((1, 512, 512, 32), (7, 7))       # the FIVES stage-0 shape
    assert not ok((1, 8, 8, 8), (3, 3))        # s2*c = 64 < 128
    assert not ok((1, 8, 16, 32), (2, 3))      # even kernel
    assert not ok((1, 8, 16, 256), (3, 3))     # c > 128
    assert not ok((1, 8, 15, 32), (3, 3))      # s2*c % 128 != 0


def test_packed_chain_update_s_2d_matches_lax(monkeypatch):
    """Deconv's packed-resident update_s chain, 2-D mapping (fwd + grad)."""
    import factorizer_tpu as ftx
    from factorizer_tpu.factorization import deconv as dc

    d = ftx.Deconv(channels=16, kernel_size=(3, 3), groups=-1, ratio=1, num_iters=2)
    x = jax.random.uniform(jax.random.key(0), (1, 8, 16, 16), jnp.float32) + 0.1
    v = d.init(jax.random.key(1), x)

    y_ref = d.apply(v, x)  # CPU: chain ineligible -> lax path
    monkeypatch.setattr(
        dc.Deconv, "_packed_chain_eligible", lambda self, x, s, h: True
    )
    y_fast = d.apply(v, x)  # interpret-mode packed chain
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-4, rtol=1e-4)

    def loss(v):
        return jnp.sum(d.apply(v, x) ** 2)

    g_fast = jax.grad(loss)(v)
    monkeypatch.undo()
    g_ref = jax.grad(loss)(v)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=1e-3)


def test_packed_eligibility():
    ok = dpk.supports_packed
    assert ok((1, 8, 8, 16, 32), (3, 3, 3))
    assert not ok((1, 8, 8, 8, 8), (3, 3, 3))      # s3*c = 64 < 128
    assert not ok((1, 8, 8, 16, 32), (2, 3, 3))    # even kernel
    assert not ok((1, 8, 8, 16, 256), (3, 3, 3))   # c > 128
    assert not ok((1, 8, 8, 15, 32), (3, 3, 3))    # s3*c % 128 != 0


def test_packed_chain_update_s_matches_lax(monkeypatch):
    """Deconv's packed-resident update_s chain == the lax path (fwd + grad)."""
    import factorizer_tpu as ftx
    from factorizer_tpu.factorization import deconv as dc

    d = ftx.Deconv(channels=16, kernel_size=(3, 3, 3), groups=-1, ratio=1, num_iters=2)
    x = jax.random.uniform(jax.random.key(0), (1, 8, 8, 8, 16), jnp.float32) + 0.1
    v = d.init(jax.random.key(1), x)

    y_ref = d.apply(v, x)  # CPU: chain ineligible -> lax path
    monkeypatch.setattr(
        dc.Deconv, "_packed_chain_eligible", lambda self, x, s, h: True
    )
    y_fast = d.apply(v, x)  # interpret-mode packed chain
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-4, rtol=1e-4)

    def loss(v):
        return jnp.sum(d.apply(v, x) ** 2)

    g_fast = jax.grad(loss)(v)
    monkeypatch.undo()
    g_ref = jax.grad(loss)(v)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=1e-3)
