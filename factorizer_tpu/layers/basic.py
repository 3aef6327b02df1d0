"""Basic layers: Linear, LayerNorm, MLP, Conv/ConvTranspose/Dropout wrappers.

TPU-native counterparts of the reference primitives
(reference: factorizer/layers/{linear,norm,mlp}.py).  All layers here are
**channels-last** native (``(B, *spatial, C)``): on TPU this removes the
reference's Conv1d-flatten contortion (linear.py:43-58) and the einsum
transposes around LayerNorm (norm.py:31-33) — a Dense / LayerNorm over the
trailing axis is already the optimal layout for the MXU/VPU.

Default initializers match torch's (kaiming-uniform with a=sqrt(5) for
kernels, fan-in uniform for biases) so training dynamics track the reference.
"""

from __future__ import annotations

import itertools
import logging
import math
import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import dtypes as _dtypes
from jax import Array

from ..utils.helpers import to_ntuple

__all__ = [
    "Identity",
    "Linear",
    "LayerNorm",
    "MLP",
    "maybe_fused_prenorm_mlp",
    "Conv",
    "ConvTranspose",
    "Dropout",
    "GroupNorm",
    "torch_kernel_init",
    "torch_bias_init",
    "resolve_activation",
    "ACTIVATIONS",
]

# torch's nn.Linear/nn.ConvNd default: kaiming_uniform(a=sqrt(5)) == uniform with
# variance 1/(3*fan_in).
torch_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _gelu_exact(x: Array) -> Array:
    # torch nn.GELU default is the exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": _gelu_exact,
    "leaky_relu": jax.nn.leaky_relu,  # default negative_slope 0.01, same as torch
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def resolve_activation(spec: Any):
    """Resolve an activation spec: a name, an elementwise fn, or a factory.

    Accepts ``"relu"``, ``jax.nn.relu``, or a zero-arg factory returning an
    elementwise fn (the reference passes classes like ``nn.ReLU``).
    """
    if spec is None:
        return ACTIVATIONS["identity"]
    if isinstance(spec, str):
        return ACTIVATIONS[spec]
    try:
        probe = spec(jnp.zeros(()))
        if isinstance(probe, jnp.ndarray):
            return spec
    except TypeError:
        pass
    return spec()


class Identity(nn.Module):
    """No-op module (accepts and ignores extra constructor-free call args)."""

    @nn.compact
    def __call__(self, x: Array, *args: Any, **kwargs: Any) -> Array:
        return x


class Linear(nn.Module):
    """Pointwise linear over the channel (trailing) axis.

    Equivalent to the reference's channels-first 1x1-conv Linear
    (layers/linear.py:7-58) but a plain Dense in channels-last layout.

    Shape: ``(B, *spatial, C_in) -> (B, *spatial, C_out)``.
    """

    in_channels: int
    out_channels: int
    bias: Any = True  # truthiness, matching the reference quirk (factorizer.py:31)
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(
            self.out_channels,
            use_bias=bool(self.bias),
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.in_channels),
            name="linear",
        )(x)


class LayerNorm(nn.Module):
    """Layer normalization over the channel (trailing) axis.

    Matches the reference semantics (normalize over C only,
    layers/norm.py:5-34) without its transpose round trip.
    """

    dim: int
    eps: float = 1e-5  # torch default
    dtype: Any = None  # output/compute dtype; statistics always in float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)


class Dropout(nn.Module):
    """Dropout with torch-like ``p`` argument; inert when ``deterministic``."""

    p: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        return nn.Dropout(rate=self.p, deterministic=deterministic)(x)


class MLP(nn.Module):
    """Token-wise feed-forward: Linear -> GELU -> Drop -> Linear -> Drop.

    (reference: layers/mlp.py:10-63; default hidden ratio 3.0)
    """

    in_channels: int
    out_channels: Optional[int] = None
    hidden_channels: Optional[int] = None
    ratio: float = 3.0
    dropout: float | tuple[float, float] = 0.0
    bias: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out_ch = self.out_channels or self.in_channels
        hidden = self.hidden_channels or int(self.ratio * self.in_channels)
        d1, d2 = to_ntuple(self.dropout, 2)

        x = Linear(self.in_channels, hidden, bias=self.bias, dtype=self.dtype, name="fc1")(x)
        x = _gelu_exact(x)
        x = nn.Dropout(rate=d1, deterministic=deterministic)(x)
        x = Linear(hidden, out_ch, bias=self.bias, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(rate=d2, deterministic=deterministic)(x)
        return x


# Fused pre-norm MLP residual path ------------------------------------------
#
# Both flagship block families end with ``x + mlp(norm2(x))`` (reference:
# factorizer.py:60-77, deconver.py:49-65).  Where eligible this runs as one
# Pallas pass (ops/pallas/mlp_block.py) instead of the 5-op XLA chain that
# round-trips the 4x hidden activations through HBM.  Opt out with
# ``FTX_FUSED_MLP=0``; force on non-TPU backends (interpret mode, tests)
# with ``FTX_FUSED_MLP=force``.

_FUSED_MLP_LOGGED: set[str] = set()


def _fused_prenorm_mlp_reason(norm2, mlp, x: Array, deterministic: bool):
    """Why this norm+MLP pair can NOT take the fused kernel (None = it can)."""
    mode = os.environ.get("FTX_FUSED_MLP", "1")
    if mode == "0":
        return "FTX_FUSED_MLP=0 (explicit opt-out)"
    if not isinstance(norm2, LayerNorm):
        return f"norm is {type(norm2).__name__}, kernel covers LayerNorm only"
    if not isinstance(mlp, MLP):
        return f"mlp is {type(mlp).__name__}"
    if mlp.out_channels not in (None, mlp.in_channels):
        return "MLP is not shape-preserving (no residual form)"
    d1, d2 = to_ntuple(mlp.dropout, 2)
    if not deterministic and (d1 or d2):
        return "active dropout (training with dropout > 0)"
    hidden = mlp.hidden_channels or int(mlp.ratio * mlp.in_channels)
    from ..ops.pallas.mlp_block import supports_fused_mlp

    if not supports_fused_mlp(x.shape, hidden, x.dtype):
        return (
            f"shape/dtype outside kernel coverage (C={x.shape[-1]}, "
            f"hidden={hidden}, dtype={x.dtype})"
        )
    if mode != "force" and not any(d.platform == "tpu" for d in jax.devices()):
        return "not on TPU (set FTX_FUSED_MLP=force to run in interpret mode)"
    return None


def maybe_fused_prenorm_mlp(
    norm2, mlp, x: Array, deterministic: bool = True
) -> Optional[Array]:
    """``x + mlp(norm2(x))`` through the fused Pallas kernel, or None.

    Reads the bound submodules' existing parameter leaves, so checkpoints
    and init are identical to the unfused path; callers fall back to the
    module calls when this returns None (ineligible config or non-TPU).
    """
    reason = _fused_prenorm_mlp_reason(norm2, mlp, x, deterministic)
    if reason is not None:
        key = reason.split("(")[0]
        if x.dtype == jnp.bfloat16 and key not in _FUSED_MLP_LOGGED:
            _FUSED_MLP_LOGGED.add(key)
            logging.getLogger(__name__).info(
                "pre-norm MLP falls back to the unfused XLA chain: %s", reason
            )
        return None
    from ..ops.pallas.mlp_block import fused_prenorm_mlp

    hidden = mlp.hidden_channels or int(mlp.ratio * mlp.in_channels)
    n = norm2.variables["params"]["norm"]
    p1 = mlp.variables["params"]["fc1"]["linear"]
    p2 = mlp.variables["params"]["fc2"]["linear"]
    b1 = p1.get("bias", jnp.zeros((hidden,), jnp.float32))
    b2 = p2.get("bias", jnp.zeros((mlp.in_channels,), jnp.float32))
    return fused_prenorm_mlp(
        x, n["scale"], n["bias"], p1["kernel"], b1, p2["kernel"], b2,
        eps=norm2.eps,
    )


# Upper bound on the im2col column-tensor size (bytes).  The flagship stem at
# batch 2, 4ch, 128^3 f32 builds a ~1.8 GB column tensor and still wins on the
# 16 GB v5e, but doubling again approaches HBM pressure from the rest of the
# graph; beyond this the lax conv path is used instead.
_IM2COL_BYTES_CAP = int(float(os.environ.get("FTX_IM2COL_BYTES_CAP", 4e9)))


def _conv_dim_numbers(p: int):
    s = "DHW"[3 - p :]
    return (f"N{s}C", f"{s}IO", f"N{s}C")


def _patch_subs(p: int) -> tuple[str, str, str]:
    """Einsum subscripts for patch-interleaved contractions: grid axes,
    intra-patch axes, and their (grid, patch)-interleaved pairing."""
    g, k = "wxyz"[:p], "ijkl"[:p]
    return g, k, "".join(a + b for a, b in zip(g, k))


def _patch_view(x: Array, ks: Sequence[int]) -> Array:
    """Free byte-reshape splitting each spatial axis into (grid, patch)."""
    B, *spatial, c = x.shape
    shape = [B]
    for s, k in zip(spatial, ks):
        shape += [s // k, k]
    return x.reshape(*shape, c)


@jax.custom_vjp
def _space_to_depth_matmul(x: Array, kernel: Array) -> Array:
    """Non-overlapping conv (``kernel_size == strides``, no padding) as one
    MXU contraction: a free byte-reshape splits each spatial axis into
    (grid, intra-patch), then a single einsum contracts the intra-patch axes
    and channels with the kernel.  Exactly equal to the XLA conv (same
    cross-correlation index order) but sidesteps XLA:TPU's conv layout
    assignment, which in-context inserts multi-ms layout copies around
    small-channel convs (see PERFORMANCE.md round-2 trace analysis).

    The einsum form lets XLA pick the patch gather strategy instead of
    forcing a materialized 2p+2-D transpose; in the flagship train step it
    measured 0.2422 s vs 0.2488 s for the explicit transpose+matmul form
    (bytes 123.9 vs 125.8 GB, round-4 sweep).

    Custom VJP: XLA's autodiff derives the input gradient as a convolution,
    which TPU layout assignment surrounds with multi-ms T(2,128) relayout
    copies of the 2p+2-D interleaved tensors (round-4 trace: ~12 ms/step).
    Hand-written, the input gradient IS the mirror depth-to-space einsum and
    the kernel gradient a plain contraction — both stay in the free-reshape
    layout family.
    """
    p = x.ndim - 2
    g, k, il = _patch_subs(p)
    return jnp.einsum(
        f"b{il}c,{k}cd->b{g}d", _patch_view(x, kernel.shape[:p]), kernel
    )


def _s2d_fwd(x, kernel):
    return _space_to_depth_matmul(x, kernel), (x, kernel)


def _s2d_bwd(res, dy):
    x, kernel = res
    p = x.ndim - 2
    g, k, il = _patch_subs(p)
    dx = jnp.einsum(f"b{g}d,{k}cd->b{il}c", dy, kernel).reshape(x.shape)
    dk = jnp.einsum(f"b{il}c,b{g}d->{k}cd", _patch_view(x, kernel.shape[:p]), dy)
    return dx, dk


_space_to_depth_matmul.defvjp(_s2d_fwd, _s2d_bwd)


@jax.custom_vjp
def _depth_to_space_matmul(x: Array, kernel: Array) -> Array:
    """Mirror of ``_space_to_depth_matmul`` for the k==s conv-transpose
    upsample: one einsum emits the output directly in (grid, intra-patch)-
    interleaved order, so the depth-to-space restructuring is a free
    byte-reshape instead of a materialized 2p+2-D transpose (chosen by
    interleaved chip measurement, PERFORMANCE.md round 4: train step
    0.2264 -> 0.2210 s).  ``kernel`` is the spatially-flipped
    ``(*ks, c_in, c_out)`` filter.  Custom VJP for the same reason as the
    s2d form: the hand-written gradients are the mirror einsums and avoid
    XLA's derived-convolution layout copies.
    """
    p = x.ndim - 2
    ks = kernel.shape[:p]
    g, k, il = _patch_subs(p)
    B, *grid, _ = x.shape
    y = jnp.einsum(f"b{g}c,{k}cd->b{il}d", x, kernel)
    return y.reshape(B, *[gg * kk for gg, kk in zip(grid, ks)], kernel.shape[-1])


def _d2s_fwd(x, kernel):
    return _depth_to_space_matmul(x, kernel), (x, kernel)


def _d2s_bwd(res, dy):
    x, kernel = res
    p = x.ndim - 2
    g, k, il = _patch_subs(p)
    dyr = _patch_view(dy, kernel.shape[:p])
    dx = jnp.einsum(f"b{il}d,{k}cd->b{g}c", dyr, kernel)
    dk = jnp.einsum(f"b{g}c,b{il}d->{k}cd", x, dyr)
    return dx, dk


_depth_to_space_matmul.defvjp(_d2s_fwd, _d2s_bwd)


# A strided-slice alternative to the space-to-depth transpose was built and
# measured AGAINST (round 3): folding the minor spatial axis into channels by
# a free byte reshape ((S3, C) -> (S3/k3, k3*C)) and summing one matmul per
# major offset over stride-k slices (backward: interior lax.pad fused into the
# cotangent sum).  Exact parity, but the flagship bf16 forward measured
# 49.5-51.3 ms vs 48.2-49.1 ms for the transpose form (0.95x, interleaved
# runs) — XLA's 8-D space-to-depth transpose already outruns the k^2 summed
# strided-slice matmuls, so the variant was deleted (PERFORMANCE.md).


def _im2col_patches_matmul(x: Array, kernel: Array, ks: Sequence[int], pads) -> Array:
    """``_im2col_matmul`` via XLA's conv_general_dilated_patches emitter.

    Probe variant (``FTX_STEM=patches``): lets XLA build the column tensor
    with its patch-extraction conv emitter instead of the 27-slice concat.
    Patch features come out channel-major ``(c, *offsets)``, so the kernel
    is reordered to match (exact same math; asserted in tests).
    """
    import jax.lax as lax

    xt = jnp.moveaxis(x, -1, 1)  # channels-first for the patches op
    p = lax.conv_general_dilated_patches(xt, tuple(ks), (1,) * len(ks), list(pads))
    cols = jnp.moveaxis(p, 1, -1)
    kflat = jnp.moveaxis(kernel, -2, 0).reshape(-1, kernel.shape[-1])
    return cols @ kflat


def _im2col_matmul(x: Array, kernel: Array, ks: Sequence[int], pads) -> Array:
    """Stride-1 conv as shifted-slice stacking + one matmul.

    Only used when ``prod(kernel_size) * C_in`` fits one lane tile (<= 128),
    i.e. small-channel stems, where XLA's conv emitters are channel-starved
    and its layout choices dominate runtime.  The column tensor's last-axis
    order is (offset-major, channel-minor), matching the flattened kernel.
    """
    B, *spatial, c = x.shape
    out_sp = [s + lo + hi - k + 1 for s, (lo, hi), k in zip(spatial, pads, ks)]
    xp = jnp.pad(x, ((0, 0), *pads, (0, 0)))
    cols = jnp.concatenate(
        [
            xp[(slice(None), *[slice(o, o + n) for o, n in zip(off, out_sp)], slice(None))]
            for off in itertools.product(*[range(k) for k in ks])
        ],
        axis=-1,
    )
    return cols @ kernel.reshape(-1, kernel.shape[-1])


class _FastConv(nn.Module):
    """``nn.Conv`` drop-in (same param tree: ``kernel``/``bias``) with
    matmul-formulated fast paths for the U-Net's hot conv shapes.

    XLA:TPU picks conv layouts per-instruction; in the full flagship graph
    that surrounded the stem / k2s2 down / k1 head convs with layout copies
    costing several ms each (round-2 trace: stem path 18 ms vs 3 ms
    standalone).  Reformulating the eligible convs as reshape+matmul keeps
    everything in the canonical channels-last layout.
    """

    features: int
    kernel_size: tuple
    strides: tuple
    padding: tuple  # ((lo, hi), ...) per spatial dim
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_dilation: tuple = ()
    dtype: Any = None
    kernel_init: Any = torch_kernel_init
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        ks, st = self.kernel_size, self.strides
        dil = self.kernel_dilation or (1,) * len(ks)
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (*ks, in_ch // self.feature_group_count, self.features),
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)

        spatial = x.shape[1:-1]
        simple = self.feature_group_count == 1 and all(d == 1 for d in dil)
        no_pad = all(lo == 0 and hi == 0 for lo, hi in self.padding)
        if (
            simple
            and ks == st
            and no_pad
            and all(s % k == 0 for s, k in zip(spatial, ks))
        ):
            y = _space_to_depth_matmul(x, kernel)
        elif (
            simple
            and all(s == 1 for s in st)
            and math.prod(ks) * in_ch <= 128
            # cap the materialized column tensor (prod(ks) x input) so large
            # batch/volume stems can't balloon to multi-GB temporaries
            and x.size * math.prod(ks) * x.dtype.itemsize <= _IM2COL_BYTES_CAP
            and os.environ.get("FTX_STEM", "im2col") != "conv"
        ):
            if os.environ.get("FTX_STEM") == "patches":
                y = _im2col_patches_matmul(x, kernel, ks, self.padding)
            else:
                y = _im2col_matmul(x, kernel, ks, self.padding)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=st,
                padding=list(self.padding),
                rhs_dilation=dil,
                dimension_numbers=_conv_dim_numbers(len(ks)),
                feature_group_count=self.feature_group_count,
            )
        if bias is not None:
            y = y + bias
        return y


class _FastConvTranspose(nn.Module):
    """``nn.ConvTranspose`` (VALID padding) drop-in with a matmul fast path
    for the U-Net upsample case ``kernel_size == strides``: one MXU matmul
    with the spatially-flipped kernel, then a depth-to-space interleave.
    Bit-compatible param tree (``kernel``/``bias``) and identical math
    (verified against ``nn.ConvTranspose`` in tests/test_fast_conv.py).
    """

    features: int
    kernel_size: tuple
    strides: tuple
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Any = torch_kernel_init
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        ks, st = self.kernel_size, self.strides
        p = len(ks)
        kernel = self.param("kernel", self.kernel_init, (*ks, in_ch, self.features))
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)

        if ks == st:
            # lax.conv_transpose (transpose_kernel=False) applies the
            # spatially-flipped kernel; with k == s each input voxel expands
            # into an independent k^p block: y[..., i*k+a, co] =
            # sum_ci x[..., i, ci] * flip(K)[a, ci, co].
            flipped = kernel[(slice(None, None, -1),) * p]
            y = _depth_to_space_matmul(x, flipped)
        else:
            y = jax.lax.conv_transpose(
                x,
                kernel,
                strides=st,
                padding="VALID",
                dimension_numbers=_conv_dim_numbers(p),
            )
        if bias is not None:
            y = y + bias
        return y


class Conv(nn.Module):
    """N-D convolution, channels-last, torch-like constructor signature.

    ``padding`` is an integer (symmetric per-dim zero padding), matching the
    reference's torch convs; spatial rank is taken from the input.
    """

    in_channels: int
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    groups: int = 1
    bias: Any = True
    dilation: int | Sequence[int] = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = x.ndim - 2
        ks = to_ntuple(self.kernel_size, p)
        pad = tuple((q, q) for q in to_ntuple(self.padding, p))
        fan_in = self.in_channels // self.groups * math.prod(ks)
        return _FastConv(
            self.out_channels,
            kernel_size=ks,
            strides=to_ntuple(self.stride, p),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=bool(self.bias),
            kernel_dilation=to_ntuple(self.dilation, p),
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class ConvTranspose(nn.Module):
    """N-D transposed convolution, channels-last, torch-like signature.

    With ``kernel_size == stride`` (the U-Net upsample case) this exactly
    doubles/multiplies the spatial size like torch's ConvTransposeNd.
    """

    in_channels: int
    out_channels: int
    kernel_size: int | Sequence[int] = 2
    stride: int | Sequence[int] = 2
    bias: Any = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = x.ndim - 2
        ks = to_ntuple(self.kernel_size, p)
        fan_in = self.in_channels * math.prod(ks)
        return _FastConvTranspose(
            self.out_channels,
            kernel_size=ks,
            strides=to_ntuple(self.stride, p),
            use_bias=bool(self.bias),
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class GroupNorm(nn.Module):
    """Group normalization over channels-last inputs (torch epsilon)."""

    num_groups: int
    dim: Optional[int] = None  # torch-style (num_groups, num_channels) signature
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps, name="norm")(x)


class InstanceNorm(nn.Module):
    """Instance normalization (per-channel spatial norm), torch defaults.

    torch ``InstanceNormNd`` defaults to ``affine=False``; equivalent to
    GroupNorm with one channel per group and no learned scale/bias.
    """

    dim: int
    eps: float = 1e-5
    affine: bool = False
    dtype: Any = None  # output/compute dtype; statistics stay float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.GroupNorm(
            num_groups=self.dim,
            epsilon=self.eps,
            use_scale=self.affine,
            use_bias=self.affine,
            dtype=self.dtype,
            name="norm",
        )(x)
