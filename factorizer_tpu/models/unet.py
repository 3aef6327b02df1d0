"""Generic U-Net skeleton, parameterized by per-stage block specs.

TPU-native counterpart of the reference U-Net (reference: factorizer/unet.py).
Internals are channels-last ``(B, *S, C)`` (TPU conv layout); the public
``__call__`` accepts channels-first ``(B, C, *S)`` by default for reference
API parity and transposes at the boundary (XLA fuses the transpose into the
stem/head convs).

Per-stage ``block`` specs follow the partialize idiom and are invoked with
``(in_channels, out_channels, depth=..., spatial_size=...)``, passing only the
keywords the block class accepts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..layers.basic import Conv, ConvTranspose, Identity
from ..layers.conv_blocks import DoubleConv
from ..utils.helpers import partialize

__all__ = ["UNet", "Same", "spec_accepts", "build_block"]

CHANNELS_FIRST = "channels_first"
CHANNELS_LAST = "channels_last"


class Same:
    """Indexable wrapper returning the same block spec for every stage."""

    def __init__(self, block: Any) -> None:
        self.block = block

    def __getitem__(self, idx: Any) -> Any:
        return self.block


def _spec_class(spec: Any):
    fn = partialize(spec)
    return getattr(fn, "func", fn)


def spec_accepts(spec: Any, key: str) -> bool:
    """True if the spec's underlying class/callable accepts keyword ``key``."""
    cls = _spec_class(spec)
    if isinstance(cls, type) and dataclasses.is_dataclass(cls):
        return any(f.name == key for f in dataclasses.fields(cls))
    try:
        import inspect

        return key in inspect.signature(cls).parameters
    except (TypeError, ValueError):
        return False


def dtype_kwargs(spec: Any, dtype: Any) -> dict:
    """``{"dtype": dtype}`` when it should be threaded into ``spec``.

    Empty when ``dtype`` is None (never override a spec's own choice with
    None), when the spec does not accept ``dtype``, or when the spec already
    binds one (e.g. ``(LayerNorm, {"dtype": jnp.float32})`` keeps its f32
    norms under a bf16 model)."""
    if dtype is None or not spec_accepts(spec, "dtype"):
        return {}
    if "dtype" in getattr(partialize(spec), "keywords", {}):
        return {}
    return {"dtype": dtype}


def build_block(spec: Any, *args: Any, name: Optional[str] = None, **kwargs: Any):
    """Instantiate a block spec, dropping kwargs it does not accept.

    ``dtype`` follows :func:`dtype_kwargs` semantics: a None model dtype or
    a dtype the spec itself binds is never overridden."""
    fn = partialize(spec)
    kept = {k: v for k, v in kwargs.items() if spec_accepts(spec, k)}
    if "dtype" in kept and not dtype_kwargs(spec, kept["dtype"]):
        del kept["dtype"]
    if name is not None and spec_accepts(spec, "name"):
        kept["name"] = name
    return fn(*args, **kept)


class UNet(nn.Module):
    """Generic U-shaped encoder/decoder with skip connections.

    Attributes mirror the reference constructor (unet.py:177-258):

        in_channels/out_channels: model input/output channels.
        spatial_size: input spatial size (needed by spatial-aware blocks).
        encoder_depth/encoder_width/strides: per-encoder-stage config; stage i
            downsamples by ``strides[i]`` (stride 1 = no downsample).
        decoder_depth: per-decoder-stage depth (decoder runs deepest-first).
        stem/downsample/block/upsample/head: partializable component specs;
            ``block`` may be a single spec, a ``Same`` wrapper, or a list with
            one spec per stage (encoder stages first, then decoder stages).
        num_deep_supr: False for a single full-resolution head, or an int n
            for n deep-supervision heads over the n finest decoder outputs.
        data_format: layout of ``__call__`` inputs/outputs.
    """

    in_channels: int
    out_channels: int
    spatial_dims: int = 3
    spatial_size: Optional[Sequence[int]] = None
    encoder_depth: Sequence[int] = (1, 1, 1, 1, 1)
    encoder_width: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (1, 2, 2, 2, 2)
    decoder_depth: Sequence[int] = (1, 1, 1, 1)
    stem: Any = None
    downsample: Any = None
    block: Any = None
    upsample: Any = None
    head: Any = None
    num_deep_supr: Any = False
    data_format: str = CHANNELS_FIRST
    dtype: Any = None  # compute dtype for blocks that support it (e.g. bfloat16)
    remat: bool = False  # rematerialize stage activations in the backward

    def setup(self) -> None:
        n_enc = len(self.encoder_depth)
        n_dec = len(self.decoder_depth)

        # Resolve per-stage block specs (encoder stages first, then decoder).
        block = self.block
        if block is None:
            block = Same((DoubleConv, {}))
        if isinstance(block, Same) or not isinstance(block, (list, tuple)):
            block = Same(block) if not isinstance(block, Same) else block
            blocks = [block[i] for i in range(n_enc + n_dec)]
        else:
            blocks = list(block)

        stem = self.stem
        if stem in (None, Identity):
            stem_spec, stem_width = None, self.in_channels
        else:
            stem_spec, stem_width = stem, self.encoder_width[0]
        self.stem_ = (
            Identity(name="stem")
            if stem_spec is None
            else build_block(stem_spec, self.in_channels, stem_width, dtype=self.dtype, name="stem")
        )

        downsample = self.downsample or (Conv, {"kernel_size": 2})
        upsample = self.upsample or (ConvTranspose, {"kernel_size": 2})
        head = self.head or (Conv, {"kernel_size": 1})

        # --- encoder ---
        widths = [stem_width, *self.encoder_width]
        size = tuple(self.spatial_size) if self.spatial_size is not None else None
        enc_downs, enc_blocks, sizes = [], [], []
        for i in range(n_enc):
            stride = self.strides[i]
            if size is not None:
                size = tuple(d // stride for d in size)
            sizes.append(size)
            if stride == 1:
                enc_downs.append(Identity(name=f"down{i}"))
                down_in = widths[i]
                if down_in != widths[i + 1]:
                    raise ValueError(
                        "stride-1 encoder stage requires matching widths "
                        f"(got {down_in} -> {widths[i + 1]}); stage blocks adapt channels."
                    )
            else:
                enc_downs.append(
                    build_block(
                        downsample, widths[i], widths[i + 1], stride=stride,
                        dtype=self.dtype, name=f"down{i}",
                    )
                )
            enc_blocks.append(
                build_block(
                    blocks[i],
                    widths[i + 1] if stride != 1 else widths[i],
                    widths[i + 1],
                    depth=self.encoder_depth[i],
                    spatial_size=size,
                    dtype=self.dtype,
                    name=f"enc{i}",
                )
            )
        self.encoder_downs = enc_downs
        self.encoder_blocks = enc_blocks

        # --- decoder (deepest-first) ---
        dec_widths = list(self.encoder_width[::-1])
        dec_strides = list(self.strides[::-1][:n_dec])
        dec_ups, dec_blocks = [], []
        for i in range(n_dec):
            stride = dec_strides[i]
            if size is not None:
                size = tuple(d * stride for d in size)
            dec_ups.append(
                build_block(
                    upsample, dec_widths[i], dec_widths[i + 1], stride=stride,
                    dtype=self.dtype, name=f"up{i}",
                )
            )
            dec_blocks.append(
                build_block(
                    blocks[n_enc + i],
                    2 * dec_widths[i + 1],
                    dec_widths[i + 1],
                    depth=self.decoder_depth[i],
                    spatial_size=size,
                    dtype=self.dtype,
                    name=f"dec{i}",
                )
            )
        self.decoder_ups = dec_ups
        self.decoder_blocks = dec_blocks

        # --- head(s) ---
        if self.num_deep_supr in (False, None, 0):
            self.num_deep_supr_ = 0
            self.head_ = build_block(head, self.encoder_width[0], self.out_channels, name="head")
        else:
            self.num_deep_supr_ = 3 if self.num_deep_supr is True else int(self.num_deep_supr)
            self.heads_ = [
                build_block(head, self.encoder_width[j], self.out_channels, name=f"head{j}")
                for j in range(self.num_deep_supr_)
            ]

    def forward_features(self, x: Array, deterministic: bool = True) -> list[Array]:
        """Channels-last feature pass; returns the decoder pyramid (finest first)."""
        if self.remat:
            # Trade FLOPs for memory: stage activations are recomputed in the
            # backward instead of stored (enables larger batches at 128^3;
            # the reference relies on 32+ GB GPUs for batch 2, train.yaml).
            import flax.linen as nn

            run = nn.remat(
                lambda mdl, x, det: mdl(x, deterministic=det),
                static_argnums=(2,),
            )
        else:
            run = lambda mdl, x, det: mdl(x, deterministic=det)  # noqa: E731

        out = self.stem_(x)

        skips: list[Array] = []
        for down, block in zip(self.encoder_downs, self.encoder_blocks):
            out = down(out)
            out = run(block, out, deterministic)
            skips.append(out)

        ys = list(skips)
        for i, (up, block) in enumerate(zip(self.decoder_ups, self.decoder_blocks)):
            hi = up(ys[-1 - i])
            cat = jnp.concatenate([ys[-2 - i], hi], axis=-1)
            ys[-2 - i] = run(block, cat, deterministic)
        return ys

    def __call__(self, x: Array, train: bool = False):
        if self.data_format == CHANNELS_FIRST:
            x = jnp.moveaxis(x, 1, -1)

        ys = self.forward_features(x, deterministic=not train)

        if self.num_deep_supr_:
            outs = [self.heads_[j](ys[j]) for j in range(self.num_deep_supr_)]
            if self.data_format == CHANNELS_FIRST:
                outs = [jnp.moveaxis(y, -1, 1) for y in outs]
            return outs

        out = self.head_(ys[0])
        if self.data_format == CHANNELS_FIRST:
            out = jnp.moveaxis(out, -1, 1)
        return out
