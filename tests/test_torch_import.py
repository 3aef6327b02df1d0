"""Checkpoint-import parity: reference torch weights -> our model, same output."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys  # noqa: E402

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")
ft_ref = pytest.importorskip("factorizer")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import factorizer_tpu as ftx  # noqa: E402
from factorizer_tpu.utils.torch_import import import_torch_checkpoint  # noqa: E402

SP = (16, 16, 16)


def test_factorizer_checkpoint_import_output_parity():
    ref = ft_ref.Factorizer(
        in_channels=2,
        out_channels=2,
        spatial_size=SP,
        encoder_depth=(1, 1),
        encoder_width=(8, 16),
        strides=(1, 2),
        decoder_depth=(1,),
        norm=ft_ref.LayerNorm,
        reshape=(ft_ref.SWMatricize, {"head_dim": 4, "patch_size": 4}),
        factorize=ft_ref.NMF,
        rank=1,
        num_iters=2,
        init="uniform",
        solver="hals",
        mlp_ratio=2,
    )
    ref.eval()

    ours = ftx.Factorizer(
        in_channels=2,
        out_channels=2,
        spatial_size=SP,
        encoder_depth=(1, 1),
        encoder_width=(8, 16),
        strides=(1, 2),
        decoder_depth=(1,),
        reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
        rank=1,
        num_iters=2,
        init_method="uniform",
        solver="hals",
        mlp_ratio=2,
    )

    variables = import_torch_checkpoint(ref.state_dict())

    rng = np.random.default_rng(0)
    x = rng.random((1, 2, *SP), dtype=np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    y = np.asarray(jax.jit(ours.apply)(variables, jnp.asarray(x)))

    assert y.shape == y_ref.shape
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() / scale < 2e-3  # fp32 iterative-solver noise


def test_deconver_checkpoint_import_output_parity():
    ref = ft_ref.Deconver(
        in_channels=2,
        out_channels=2,
        spatial_dims=2,
        encoder_depth=(1, 1),
        encoder_width=(8, 16),
        strides=(1, 2),
        decoder_depth=(1,),
        norm=torch.nn.InstanceNorm2d,
        groups=-1,
        ratio=1,
        kernel_size=(3, 3),
        num_iters=1,
        mlp_ratio=2,
    )
    ref.eval()

    ours = ftx.Deconver(
        in_channels=2,
        out_channels=2,
        spatial_dims=2,
        encoder_depth=(1, 1),
        encoder_width=(8, 16),
        strides=(1, 2),
        decoder_depth=(1,),
        norm=ftx.InstanceNorm,
        groups=-1,
        ratio=1,
        kernel_size=(3, 3),
        num_iters=1,
        mlp_ratio=2,
    )

    variables = import_torch_checkpoint(ref.state_dict())

    rng = np.random.default_rng(1)
    x = rng.random((1, 2, 24, 24), dtype=np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    y = np.asarray(jax.jit(ours.apply)(variables, jnp.asarray(x)))

    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() / scale < 2e-3
