"""Unit tests for math ops and reshape/matricize operations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import factorizer_tpu as ftx


class TestMathOps:
    def test_dot(self):
        x = jax.random.normal(jax.random.key(0), (2, 3, 4, 5))
        y = jax.random.normal(jax.random.key(1), (2, 3, 4, 5))
        out = ftx.dot(x, y)
        assert out.shape == (2, 3, 1)
        ref = np.sum(np.asarray(x) * np.asarray(y), axis=(-2, -1))[..., None]
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_norm2(self):
        x = jax.random.normal(jax.random.key(0), (3, 4, 5))
        out = ftx.norm2(x)
        assert out.shape == (3,)
        ref = np.linalg.norm(np.asarray(x).reshape(3, -1), axis=1)
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_norm2_weighted(self):
        x = jax.random.normal(jax.random.key(0), (3, 4, 5))
        w = jax.random.uniform(jax.random.key(1), (3, 4, 5))
        ref = np.sqrt(np.sum(np.asarray(x) ** 2 * np.asarray(w), axis=(1, 2)))
        np.testing.assert_allclose(ftx.norm2(x, w), ref, rtol=1e-5)

    def test_softmax_single_axis(self):
        x = jax.random.normal(jax.random.key(0), (2, 3, 4))
        out = ftx.softmax(x, 1)
        np.testing.assert_allclose(out, jax.nn.softmax(x, axis=1), rtol=1e-6)

    def test_softmax_multi_axis(self):
        x = jax.random.normal(jax.random.key(0), (2, 3, 4))
        out = ftx.softmax(x, (1, 2))
        assert out.shape == x.shape
        np.testing.assert_allclose(np.sum(np.asarray(out), axis=(1, 2)), 1.0, rtol=1e-5)
        # Joint softmax == softmax over the flattened axes.
        flat = jax.nn.softmax(x.reshape(2, -1), axis=-1).reshape(x.shape)
        np.testing.assert_allclose(out, flat, rtol=1e-5)

    def test_relative_error(self):
        x = jax.random.normal(jax.random.key(0), (3, 4, 5))
        assert float(jnp.max(ftx.relative_error(x, x))) < 1e-6
        err = ftx.relative_error(x, jnp.zeros_like(x))
        np.testing.assert_allclose(err, 1.0, rtol=1e-5)

    def test_kl_divergence(self):
        x = jax.random.uniform(jax.random.key(0), (3, 4, 5)) + 0.1
        assert float(jnp.max(jnp.abs(ftx.kl_divergence(x, x)))) < 1e-6
        y = jax.random.uniform(jax.random.key(1), (3, 4, 5)) + 0.1
        assert bool(jnp.all(ftx.kl_divergence(x, y) >= 0))


class TestReshape:
    def test_identity(self):
        r = ftx.Reshape((2, 3, 4))
        x = jax.random.normal(jax.random.key(0), (2, 3, 4))
        assert r.output_size == (2, 3, 4)
        np.testing.assert_array_equal(r.inverse_forward(r(x)), x)

    def test_equation_roundtrip(self):
        r = ftx.Reshape((2, 6, 8), equation="b (g p) c -> b g (p c)", p=2)
        x = jax.random.normal(jax.random.key(0), (2, 6, 8))
        y = r(x)
        assert y.shape == (2, 3, 16)
        assert r.output_size == (2, 3, 16)
        np.testing.assert_array_equal(r.inverse_forward(y), x)

    def test_shifts_roundtrip(self):
        r = ftx.Reshape((2, 4, 8), equation="b c s -> b s c", shifts=(3,), dims=(2,))
        x = jax.random.normal(jax.random.key(0), (2, 4, 8))
        np.testing.assert_array_equal(r.inverse_forward(r(x)), x)


class TestMatricize:
    @pytest.mark.parametrize("data_format", ["channels_first", "channels_last"])
    def test_roundtrip(self, data_format):
        if data_format == "channels_first":
            size, x_shape = (None, 16, 8, 8, 8), (2, 16, 8, 8, 8)
        else:
            size, x_shape = (None, 8, 8, 8, 16), (2, 8, 8, 8, 16)
        m = ftx.Matricize(size, head_dim=4, patch_size=4, data_format=data_format)
        x = jax.random.normal(jax.random.key(0), x_shape)
        y = m(x)
        # (b h) (g0 g1 g2) d (p0 p1 p2) = (2*4, 8, 4, 64)
        assert y.shape == (8, 8, 4, 64)
        np.testing.assert_array_equal(m.inverse_forward(y), x)

    def test_shifted_roundtrip(self):
        m = ftx.Matricize((None, 8, 8, 8), num_heads=2, patch_size=4, shifts=2)
        x = jax.random.normal(jax.random.key(0), (3, 8, 8, 8))
        np.testing.assert_array_equal(m.inverse_forward(m(x)), x)

    def test_output_size_metadata(self):
        m = ftx.Matricize((None, 32, 128, 128, 128), head_dim=8, patch_size=8)
        assert m.output_size == (None, 4096, 8, 512)


class TestSWMatricize:
    def test_readme_contract(self):
        """The README example: exact inverse on (1, 32, 128^3) downscaled to 32^3."""
        sw = ftx.SWMatricize((None, 32, 32, 32, 32), head_dim=8, patch_size=8)
        x = jax.random.uniform(jax.random.key(0), (1, 32, 32, 32, 32))
        y = jax.jit(sw)(x)
        assert y.shape == (8, 64, 8, 512)
        z = jax.jit(sw.inverse_forward)(y)
        np.testing.assert_array_equal(z, x)  # exact, not approximate

    def test_four_shifts(self):
        """Bundle config uses shifts [null, 2, 4, 6] (train.yaml:53)."""
        sw = ftx.SWMatricize(
            (None, 16, 16, 16, 16), head_dim=4, patch_size=8, shifts=[None, 2, 4, 6]
        )
        x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 16, 16))
        y = jax.jit(sw)(x)
        assert y.shape[0] == 4 * 2 * 4  # shifts * batch * heads
        np.testing.assert_allclose(jax.jit(sw.inverse_forward)(y), x, atol=1e-6)

    def test_channels_last(self):
        sw = ftx.SWMatricize(
            (None, 16, 16, 16, 16), head_dim=4, patch_size=4, data_format="channels_last"
        )
        x = jax.random.uniform(jax.random.key(0), (1, 16, 16, 16, 16))
        np.testing.assert_array_equal(jax.jit(lambda x: sw.inverse_forward(sw(x)))(x), x)

    def test_jit_roundtrip(self):
        sw = ftx.SWMatricize((None, 8, 16, 16), head_dim=4, patch_size=4)
        f = jax.jit(lambda x: sw.inverse_forward(sw(x)))
        x = jax.random.uniform(jax.random.key(0), (2, 8, 16, 16))
        np.testing.assert_array_equal(f(x), x)
