"""Module -> model integration tests for the Deconver family.

Mirrors the reference test structure (reference: tests/test_deconver.py) at
reduced 2-D shapes (the sandbox CPU compiles slowly; parity with the
reference numerics is covered separately in test_parity_reference.py).
"""

import jax
import jax.numpy as jnp
import pytest

import factorizer_tpu as ftx

SP = (24, 24)
DECONV_OPTS = dict(kernel_size=(3, 3), ratio=1, groups=-1, num_iters=1)


@pytest.fixture(scope="module")
def deconv_and_vars():
    deconv = ftx.Deconv(4, **DECONV_OPTS)
    x = jax.random.uniform(jax.random.key(0), (2, *SP, 4))
    variables = jax.jit(deconv.init)(jax.random.key(1), x)
    return deconv, variables, x


class TestDeconv:
    def test_forward(self, deconv_and_vars):
        deconv, variables, x = deconv_and_vars
        y = jax.jit(deconv.apply)(variables, x)
        assert y.shape == (2, *SP, 4)  # groups=-1, ratio=1 -> source == channels
        assert bool(jnp.isfinite(y).all())
        assert bool((y >= 0).all())  # multiplicative updates keep nonnegativity

    def test_fit_reconstruct_roundtrip(self, deconv_and_vars):
        deconv, variables, x = deconv_and_vars
        s, h = jax.jit(lambda v, x: deconv.apply(v, x, method="fit"))(variables, x)
        x_hat = jax.jit(lambda v, s, h: deconv.apply(v, s, h, method="reconstruct"))(
            variables, s, h
        )
        assert x_hat.shape == x.shape
        err = float(ftx.relative_error(x, x_hat).mean())
        assert err < 1.0  # fitted reconstruction is better than zero-guess

    def test_more_iters_reduce_loss(self, deconv_and_vars):
        _, variables, x = deconv_and_vars
        errs = []
        for iters in [1, 4]:
            deconv = ftx.Deconv(4, kernel_size=(3, 3), ratio=1, groups=-1, num_iters=iters)

            def err_fn(v, x, deconv=deconv):
                s, h = deconv.apply(v, x, method="fit")
                x_hat = deconv.apply(v, s, h, method="reconstruct")
                return ftx.relative_error(x, x_hat).mean()

            errs.append(float(jax.jit(err_fn)(variables, x)))
        assert errs[1] <= errs[0] + 1e-5


class TestDeconvMixerBlockStage:
    def test_block(self):
        """DeconverBlock wraps DeconvMixer + MLP with pre-norm residuals."""
        blk = ftx.DeconverBlock(channels=4, mlp_ratio=2, **DECONV_OPTS)
        x = jax.random.uniform(jax.random.key(0), (2, *SP, 4))
        variables = jax.jit(blk.init)(jax.random.key(1), x)
        y = jax.jit(blk.apply)(variables, x)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())

    def test_stage_with_adapter(self):
        stage = ftx.DeconverStage(in_channels=2, out_channels=4, depth=2, mlp_ratio=2, **DECONV_OPTS)
        x = jax.random.uniform(jax.random.key(0), (2, *SP, 2))
        variables = jax.jit(stage.init)(jax.random.key(1), x)
        y = jax.jit(stage.apply)(variables, x)
        assert y.shape == (2, *SP, 4) and bool(jnp.isfinite(y).all())


class TestDeconver:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = ftx.Deconver(
            in_channels=3,
            out_channels=2,
            spatial_dims=2,
            encoder_depth=(1, 1),
            encoder_width=(4, 8),
            strides=(1, 2),
            decoder_depth=(1,),
            mlp_ratio=2,
            **DECONV_OPTS,
        )
        x = jnp.zeros((2, 3, *SP))
        variables = jax.jit(model.init)(jax.random.key(0), x)
        fwd = jax.jit(model.apply)
        return model, variables, fwd

    def test_forward_shape(self, model_and_vars):
        model, variables, fwd = model_and_vars
        x = jax.random.uniform(jax.random.key(1), (2, 3, *SP))
        y = fwd(variables, x)
        assert y.shape == (2, 2, *SP)
        assert bool(jnp.isfinite(y).all())

    def test_batch_robustness(self, model_and_vars):
        model, variables, fwd = model_and_vars
        x = jax.random.uniform(jax.random.key(1), (3, 3, *SP))
        y = fwd(variables, x)
        assert y.shape == (3, 2, *SP)

    def test_gradients_flow(self, model_and_vars):
        model, variables, _ = model_and_vars
        x = jax.random.uniform(jax.random.key(1), (2, 3, *SP))

        def loss_fn(params):
            y = model.apply({**variables, "params": params}, x)
            return jnp.mean(y**2)

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        leaves = jax.tree.leaves(grads)
        assert all(bool(jnp.isfinite(g).all()) for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
