"""Module -> model integration tests for the Factorizer family.

Mirrors the reference test structure (reference: tests/test_factorizer.py):
shape contracts, finiteness, trainable-param counts, batch-size robustness —
at reduced spatial sizes with shared compiled functions (the sandbox CPU
compiles slowly; numerics parity is covered in test_parity_reference.py).
"""

import jax
import jax.numpy as jnp
import pytest

import factorizer_tpu as ftx

SP = (16, 16, 16)
FACT_OPTS = dict(
    reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
    act="relu",
    factorize=ftx.NMF,
    rank=1,
    num_iters=3,
    init_method="uniform",
    solver="hals",
)


def n_params(variables):
    return sum(a.size for a in jax.tree.leaves(variables.get("params", {})))


class TestFactMixer:
    def test_forward(self):
        m = ftx.FactMixer(8, 8, SP, **FACT_OPTS)
        x = jax.random.uniform(jax.random.key(0), (2, *SP, 8))
        variables = jax.jit(m.init)(jax.random.key(1), x)
        y = jax.jit(m.apply)(variables, x)
        assert y.shape == x.shape
        assert bool(jnp.isfinite(y).all())
        assert n_params(variables) > 0


class TestFactorizerBlock:
    def test_forward_and_dropout(self):
        blk = ftx.FactorizerBlock(
            channels=8, spatial_size=SP, mlp_ratio=2, dropout=0.5, **FACT_OPTS
        )
        x = jax.random.uniform(jax.random.key(0), (2, *SP, 8))
        variables = jax.jit(blk.init)(jax.random.key(1), x)
        y_det = jax.jit(blk.apply)(variables, x)
        assert y_det.shape == x.shape
        assert bool(jnp.isfinite(y_det).all())
        # dropout active in train mode
        y_train = jax.jit(
            lambda v, x, r: blk.apply(v, x, deterministic=False, rngs={"dropout": r})
        )(variables, x, jax.random.key(2))
        assert not bool(jnp.allclose(y_det, y_train))


class TestFactorizerStage:
    def test_channel_adapter_and_pos_embed(self):
        stage = ftx.FactorizerStage(
            in_channels=4,
            out_channels=8,
            spatial_size=SP,
            depth=2,
            pos_embed=ftx.PositionalEmbedding,
            mlp_ratio=2,
            **FACT_OPTS,
        )
        x = jax.random.uniform(jax.random.key(0), (2, *SP, 4))
        variables = jax.jit(stage.init)(jax.random.key(1), x)
        y = jax.jit(stage.apply)(variables, x)
        assert y.shape == (2, *SP, 8)
        assert bool(jnp.isfinite(y).all())


class TestFactorizer:
    @pytest.fixture(scope="class")
    def setup(self):
        model = ftx.Factorizer(
            in_channels=4,
            out_channels=3,
            spatial_size=SP,
            encoder_depth=(1, 1, 1),
            encoder_width=(4, 8, 16),
            strides=(1, 2, 2),
            decoder_depth=(1, 1),
            mlp_ratio=2,
            **FACT_OPTS,
        )
        x = jnp.zeros((2, 4, *SP))
        variables = jax.jit(model.init)(jax.random.key(0), x)
        fwd = jax.jit(model.apply)
        return model, variables, fwd

    def test_forward_shape(self, setup):
        model, variables, fwd = setup
        x = jax.random.uniform(jax.random.key(1), (2, 4, *SP))
        y = fwd(variables, x)
        assert y.shape == (2, 3, *SP)
        assert bool(jnp.isfinite(y).all())
        assert n_params(variables) > 0

    def test_batch_robustness(self, setup):
        model, variables, fwd = setup
        x = jax.random.uniform(jax.random.key(1), (3, 4, *SP))
        assert fwd(variables, x).shape == (3, 3, *SP)

    def test_gradients_flow(self, setup):
        model, variables, _ = setup
        x = jax.random.uniform(jax.random.key(1), (2, 4, *SP))

        def loss_fn(params):
            y = model.apply({**variables, "params": params}, x)
            return jnp.mean(y**2)

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        leaves = jax.tree.leaves(grads)
        assert all(bool(jnp.isfinite(g).all()) for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_deep_supervision():
    model = ftx.Factorizer(
        in_channels=2,
        out_channels=3,
        spatial_size=SP,
        encoder_depth=(1, 1),
        encoder_width=(4, 8),
        strides=(1, 2),
        decoder_depth=(1,),
        num_deep_supr=1,
        mlp_ratio=2,
        **FACT_OPTS,
    )
    x = jnp.zeros((1, 2, *SP))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    ys = jax.jit(model.apply)(variables, x)
    assert isinstance(ys, (list, tuple)) and len(ys) == 1
    assert ys[0].shape == (1, 3, *SP)


def test_generic_unet_2d():
    model = ftx.UNet(
        in_channels=2,
        out_channels=3,
        spatial_dims=2,
        encoder_depth=(1, 1),
        encoder_width=(8, 16),  # DoubleConv's default GroupNorm uses 8 groups
        strides=(1, 2),
        decoder_depth=(1,),
        stem=(ftx.Conv, {"kernel_size": 3, "padding": 1}),
    )
    x = jax.random.uniform(jax.random.key(0), (2, 2, 16, 16))
    variables = jax.jit(model.init)(jax.random.key(1), x)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (2, 3, 16, 16)


def test_fused_fallback_reason_logged(caplog):
    """A config one flag off the fused-kernel fast path names its reason
    (VERDICT round 2: silent 2-3x fallbacks)."""
    import logging

    from factorizer_tpu.models import factorizer as fmod

    fmod._LOGGED_FALLBACKS.clear()
    m = ftx.FactMixer(8, 8, SP, **{**FACT_OPTS, "rank": 2},
                      factorize_options={"explain": True})
    x = jax.random.uniform(jax.random.key(0), (1, *SP, 8))
    with caplog.at_level(logging.INFO, logger="factorizer_tpu.models.factorizer"):
        variables = m.init(jax.random.key(1), x)
        m.apply(variables, x)
    assert any("rank" in rec.getMessage() for rec in caplog.records), caplog.records

    # explicit opt-outs stay silent (no nagging about a deliberate choice)
    fmod._LOGGED_FALLBACKS.clear()
    m2 = ftx.FactMixer(8, 8, SP, **FACT_OPTS,
                       factorize_options={"use_windowed": False})
    with caplog.at_level(logging.INFO, logger="factorizer_tpu.models.factorizer"):
        caplog.clear()
        variables = m2.init(jax.random.key(1), x)
        m2.apply(variables, x)
    assert not any("falls back" in rec.getMessage() for rec in caplog.records)
