"""The README usage examples, executed (at reduced sizes where noted)."""

import jax
import jax.numpy as jnp
import numpy as np

import factorizer_tpu as ftx


def test_nmf_example():
    nmf = ftx.NMF(size=(8, 512), rank=2, num_iters=5, init_method="uniform", solver="mu")
    x = jax.random.uniform(jax.random.key(0), (1, 8, 512))
    variables = jax.jit(nmf.init)(jax.random.key(1), x)
    y = jax.jit(nmf.apply)(variables, x)
    assert y.shape == (1, 8, 512)


def test_swmatricize_example():
    """README contract at the documented config (spatial reduced 128->32)."""
    swm = ftx.SWMatricize((None, 32, 32, 32, 32), head_dim=8, patch_size=8)
    x = jax.random.uniform(jax.random.key(0), (1, 32, 32, 32, 32))
    z = jax.jit(swm)(x)
    assert z.shape == (8, 64, 8, 512)
    back = jax.jit(swm.inverse_forward)(z)
    assert bool(jnp.array_equal(back, x))  # exact, as documented


def test_factorizer_example():
    """README flagship constructor (reduced to 2 stages / 32^3 for CI)."""
    model = ftx.Factorizer(
        in_channels=4,
        out_channels=3,
        spatial_size=(32, 32, 32),
        encoder_depth=(1, 1),
        encoder_width=(32, 64),
        strides=(1, 2),
        decoder_depth=(1,),
        norm=ftx.LayerNorm,
        reshape=(ftx.SWMatricize, {"head_dim": 8, "patch_size": 8}),
        act="relu",
        factorize=ftx.NMF,
        rank=1,
        num_iters=5,
        init_method="uniform",
        solver="hals",
        mlp_ratio=2,
        dropout=0.1,
    )
    x = jnp.zeros((1, 4, 32, 32, 32))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 3, 32, 32, 32)
    assert bool(jnp.isfinite(y).all())


def test_torch_import_example():
    """README checkpoint-import entry point resolves."""
    from factorizer_tpu.utils.torch_import import import_torch_checkpoint

    assert callable(import_torch_checkpoint)
