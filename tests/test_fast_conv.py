"""Matmul-formulated conv fast paths == flax nn.Conv / nn.ConvTranspose.

The U-Net's hot convs (small-channel stem k3p1, non-overlapping k2s2
down/upsample, k1 head) are reformulated as reshape+matmul in
layers/basic.py (_FastConv/_FastConvTranspose) to sidestep XLA:TPU conv
layout assignment.  These tests pin the rewrite to the flax reference
implementations on every eligible shape class plus the fallback paths.
(reference conv semantics: torch convs used throughout
factorizer/unet.py:36-130 and factorizer/factorizer.py:146-149)
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from factorizer_tpu.layers.basic import Conv, ConvTranspose


def _flax_conv(out_ch, ks, st, pad, groups=1, bias=True, dil=1):
    p = len(ks)
    return nn.Conv(
        out_ch,
        kernel_size=ks,
        strides=st,
        padding=[(q, q) for q in pad] if isinstance(pad, tuple) else pad,
        feature_group_count=groups,
        use_bias=bias,
        kernel_dilation=(dil,) * p,
    )


CONV_CASES = [
    # (spatial, in_ch, out_ch, k, stride, pad) — fast-path classes + fallbacks
    ((12, 12, 12), 2, 8, 3, 1, 1),     # im2col (stem-like, 3-D)
    ((12, 12, 12), 4, 8, 3, 1, 1),     # im2col, 4-channel stem
    ((10, 12), 3, 6, 3, 1, 1),         # im2col, 2-D
    ((12, 12, 12), 8, 16, 2, 2, 0),    # space-to-depth (downsample)
    ((8, 8, 8), 16, 32, 1, 1, 0),      # k1 head (space-to-depth with k=1)
    ((12, 16), 8, 16, 4, 4, 0),        # space-to-depth, 2-D patch embed
    ((12, 12, 12), 16, 16, 3, 1, 1),   # fallback: large-C k3
    ((13, 13, 13), 8, 8, 2, 2, 0),     # fallback: indivisible spatial
    ((12, 12, 12), 8, 8, 3, 2, 1),     # fallback: strided k3
]


@pytest.mark.parametrize("spatial,ci,co,k,st,pad", CONV_CASES)
def test_conv_matches_flax(spatial, ci, co, k, st, pad):
    p = len(spatial)
    x = jnp.asarray(np.random.RandomState(0).randn(2, *spatial, ci), jnp.float32)
    ours = Conv(ci, co, kernel_size=k, stride=st, padding=pad)
    ref = _flax_conv(co, (k,) * p, (st,) * p, (pad,) * p)
    v = ours.init(jax.random.key(0), x)
    y = ours.apply(v, x)
    y_ref = ref.apply({"params": v["params"]["conv"]}, x)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5, rtol=2e-5)


def test_grouped_conv_matches_flax():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 10, 10, 8), jnp.float32)
    ours = Conv(8, 8, kernel_size=3, stride=1, padding=1, groups=8)
    ref = _flax_conv(8, (3, 3), (1, 1), (1, 1), groups=8)
    v = ours.init(jax.random.key(0), x)
    y = ours.apply(v, x)
    y_ref = ref.apply({"params": v["params"]["conv"]}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5, rtol=2e-5)


CONVT_CASES = [
    ((6, 6, 6), 16, 8, 2, 2),   # matmul fast path (upsample)
    ((6, 8), 8, 4, 4, 4),       # 2-D, k=s=4
    ((6, 6, 6), 8, 4, 2, 1),    # fallback: k != s
]


@pytest.mark.parametrize("spatial,ci,co,k,st", CONVT_CASES)
def test_conv_transpose_matches_flax(spatial, ci, co, k, st):
    p = len(spatial)
    x = jnp.asarray(np.random.RandomState(2).randn(2, *spatial, ci), jnp.float32)
    ours = ConvTranspose(ci, co, kernel_size=k, stride=st)
    ref = nn.ConvTranspose(co, kernel_size=(k,) * p, strides=(st,) * p, padding="VALID")
    v = ours.init(jax.random.key(0), x)
    y = ours.apply(v, x)
    y_ref = ref.apply({"params": v["params"]["conv"]}, x)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5, rtol=2e-5)


def test_conv_bias_and_bf16():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 8, 8, 8, 2), jnp.float32)
    ours = Conv(2, 8, kernel_size=3, stride=1, padding=1, dtype=jnp.bfloat16)
    v = ours.init(jax.random.key(0), x)
    y = ours.apply(v, x)
    assert y.dtype == jnp.bfloat16
    # params stay full-precision (f32, or f64 when another test in the same
    # worker has enabled jax_enable_x64), never the bf16 compute dtype
    assert v["params"]["conv"]["kernel"].dtype in (jnp.float32, jnp.float64)

    # gradient flows through the matmul formulation
    def loss(params):
        return jnp.sum(ours.apply({"params": params}, x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(jnp.all(jnp.isfinite(a)) for a in jax.tree.leaves(g))


def test_dtype_kwargs_never_overrides_spec_dtype():
    """A dtype bound inside a block spec survives the model-level dtype
    (and a None model dtype never overrides a spec's choice)."""
    from factorizer_tpu.layers.basic import LayerNorm
    from factorizer_tpu.models.unet import dtype_kwargs

    assert dtype_kwargs(LayerNorm, jnp.bfloat16) == {"dtype": jnp.bfloat16}
    assert dtype_kwargs(LayerNorm, None) == {}
    assert dtype_kwargs((LayerNorm, {"dtype": jnp.float32}), jnp.bfloat16) == {}
    assert dtype_kwargs((Conv, {"kernel_size": 3}), jnp.bfloat16) == {
        "dtype": jnp.bfloat16
    }


def test_im2col_patches_variant_matches_concat():
    """The FTX_STEM=patches probe path (conv_general_dilated_patches im2col)
    computes exactly the same stem as the 27-slice concat formulation —
    patch features come out channel-major, absorbed by a kernel reorder."""
    import numpy as np

    from factorizer_tpu.layers.basic import _im2col_matmul, _im2col_patches_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 8, 9, 10, 4), dtype=np.float32))
    k = jnp.asarray(rng.random((3, 3, 3, 4, 6), dtype=np.float32))
    pads = ((1, 1), (1, 1), (1, 1))
    a = _im2col_matmul(x, k, (3, 3, 3), pads)
    b = _im2col_patches_matmul(x, k, (3, 3, 3), pads)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
