"""Factorizer models: NMF-mixing transformer-style blocks in a U-Net.

TPU-native counterpart of the reference model family
(reference: factorizer/factorizer.py).  Blocks are channels-last; the
matricize reshape is built with ``data_format='channels_last'`` so the
fold/unfold compiles to pure transpose/reshape around the factorization.

The reference's open-ended ``**kwargs`` plumbing becomes explicit fields:
factorization options (``rank``, ``num_iters``, ``init_method``, ``solver``,
...) are first-class attributes threaded down to the ``factorize`` module,
plus a ``factorize_options`` dict for anything exotic.  Note ``init_method``
replaces the reference's ``init=`` kwarg (Flax reserves ``Module.init``); the
``"init"`` key is still accepted inside ``factorize_options``.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import flax.linen as nn
from jax import Array

from ..factorization.nmf import NMF, translate_mf_kwargs
from ..layers.basic import (
    LayerNorm,
    Linear,
    MLP,
    maybe_fused_prenorm_mlp,
    resolve_activation,
)
from ..layers.pos_embed import PositionalEmbedding
from ..ops.reshape import Matricize
from ..utils.helpers import has_args, partialize
from .unet import UNet, dtype_kwargs, spec_accepts

__all__ = ["FactMixer", "FactorizerBlock", "FactorizerStage", "Factorizer"]

logger = logging.getLogger(__name__)

# One-time fallback notices (per distinct reason) so a 5-stage model doesn't
# repeat itself; ``factorize_options={"explain": True}`` logs every time.
_LOGGED_FALLBACKS: set[str] = set()

# Factorization-option fields shared by FactMixer and its parents.
_FACT_FIELDS = (
    "rank",
    "compression",
    "num_iters",
    "num_grad_steps",
    "init_method",
    "solver",
)


class FactMixer(nn.Module):
    """Token-mixing module: project -> fold -> factorize -> unfold -> project.

    (reference: factorizer.py:9-57)
    """

    in_channels: int
    out_channels: int
    spatial_size: Sequence[int]
    reshape: Any = (Matricize, {"num_heads": 1, "grid_size": 1})
    act: Any = "relu"
    factorize: Any = NMF
    dropout: float = 0.0
    rank: Optional[int] = None
    compression: Optional[float] = None
    num_iters: Optional[int] = None
    num_grad_steps: Optional[int] = None
    init_method: Any = None
    solver: Any = None
    factorize_options: Any = None
    dtype: Any = None

    def setup(self) -> None:
        self.in_proj = Linear(self.in_channels, self.out_channels, bias=False, dtype=self.dtype)

        # Fold/unfold operator over the channels-last volume.
        reshape_fn = partialize(self.reshape)
        reshape_kwargs = {}
        if spec_accepts(self.reshape, "data_format") or has_args(reshape_fn, "data_format"):
            reshape_kwargs["data_format"] = "channels_last"
        self.reshape_op = reshape_fn(
            (None, *self.spatial_size, self.out_channels), **reshape_kwargs
        )
        self.act_fn = resolve_activation(self.act)

        # Factorized matrix size = trailing two axes of the folded tensor.
        self.reshaped_size = tuple(self.reshape_op.output_size[2:])
        fact_fn = partialize(self.factorize)
        options = dict(self.factorize_options or {})
        for f in _FACT_FIELDS:
            v = getattr(self, f)
            if v is not None:
                options.setdefault(f, v)
        options = translate_mf_kwargs(options)
        options = {k: v for k, v in options.items() if spec_accepts(fact_fn, k) or has_args(fact_fn, k)}
        self.factorize_op = fact_fn(self.reshaped_size, **options)

        # Reference quirk: out_proj is Linear(in, out, out) — the third
        # positional arg lands in `bias` (truthy), i.e. bias=True
        # (factorizer.py:31).  We use out_channels as the input width, which
        # is what the data actually has.
        self.out_proj = Linear(self.out_channels, self.out_channels, bias=True, dtype=self.dtype)
        self.drop = nn.Dropout(rate=self.dropout)

        # Fused-windowed-kernel eligibility: cubic 3-D matricize whose fold/
        # solve/unfold can run as one Pallas pass (see windowed_nmf_kernel).
        self._fw = None
        from ..factorization.nmf import MatrixFactorization as _MF
        from ..ops.reshape import Matricize as _M, SWMatricize as _SW

        mats = None
        if isinstance(self.reshape_op, _SW):
            mats = self.reshape_op.shifted_windows
        elif isinstance(self.reshape_op, _M):
            mats = [self.reshape_op]
        if mats is not None and isinstance(self.factorize_op, _MF) and len(self.spatial_size) == 3:
            ax = mats[0].axis_sizes
            d = ax.get("d")
            ps = [ax.get(f"p{i}") for i in range(3)]
            if (
                mats[0].data_format == "channels_last"
                and d is not None
                and ps[0] is not None
                and ps.count(ps[0]) == 3
            ):
                self._fw = (mats, d, ps[0])

    def _fused_windowed_call(self, out: Array) -> Array:
        """One fused fold/solve/unfold pass per shift; rolls never materialize.

        Shifts are served from a single wrap-padded copy of the volume via
        element-offset block reads (see windowed_nmf_kernel.py).  With
        ``factorize_options={"spatial_mesh": mesh, "spatial_axis": name}``
        (the volume's first spatial axis sharded over that mesh axis) the
        shard_map variant runs instead: the kernel stays local per shard and
        only the p-row halo moves over ICI (windowed_sharded.py).
        """
        mats, d, p = self._fw
        fact = self.factorize_op
        u0, v0 = fact.initializer.tables()
        eps = fact.eps if fact.eps is not None else 1e-16
        shifts = tuple(m.shifts for m in mats)
        opts = self.factorize_options or {}
        mesh = opts.get("spatial_mesh")
        if mesh is not None:
            from ..ops.pallas.windowed_sharded import windowed_nmf_multi_spatial

            return windowed_nmf_multi_spatial(
                out, u0, v0, d, p, shifts, fact.solver, fact.num_iters, eps,
                fact.num_grad_steps, mesh=mesh,
                axis_name=opts.get("spatial_axis", "model"),
            )
        from ..ops.pallas.windowed_nmf_kernel import windowed_nmf_multi

        return windowed_nmf_multi(
            out, u0, v0, d, p, shifts, fact.solver, fact.num_iters, eps,
            fact.num_grad_steps,
        )

    def _fused_fallback_reason(self, out: Array) -> Optional[str]:
        """Why this mixer can NOT take the fused windowed kernel (None = it can).

        The fallback paths are 2-3x slower (PERFORMANCE.md), so when a config
        is one flag away from eligibility the reason is logged once (and
        always with ``factorize_options={"explain": True}``).
        """
        opts = self.factorize_options or {}
        if opts.get("use_windowed") is False:
            return "factorize_options['use_windowed'] is False (explicit opt-out)"
        if opts.get("use_pallas") is False:
            return "factorize_options['use_pallas'] is False (pure-XLA mode)"
        if self._fw is None:
            from ..factorization.nmf import MatrixFactorization as _MF

            if not isinstance(self.factorize_op, _MF):
                return "factorize op is not a MatrixFactorization"
            if len(self.spatial_size) != 3:
                return "kernel requires a 3-D volume (2-D configs use the flat path)"
            return (
                "reshape is not a channels-last (SW)Matricize with cubic "
                "patches (p0 == p1 == p2) and a head_dim"
            )
        fact = self.factorize_op
        mats, d, p = self._fw
        if not isinstance(fact.solver, str):
            return "composite/custom solver objects are outside kernel coverage"
        if fact.project is not None:
            return "solver with a projection step is outside kernel coverage"
        from ..factorization.inits import RandomInit

        if not isinstance(fact.initializer, RandomInit):
            return "kernel covers RandomInit initializers only (svd/nndsvd fall back)"
        if fact.rank_ != 1:
            return f"kernel covers rank 1 only (rank={fact.rank_})"
        if fact.solver not in ("hals", "mu"):
            return f"kernel covers hals/mu solvers only (solver={fact.solver!r})"
        if len(out.shape) != 5:
            return f"expected a (B, S1, S2, S3, C) tensor, got {len(out.shape)}-D"
        _, s1, s2, s3, c = out.shape
        if c % d != 0:
            return f"channels {c} not divisible by head_dim {d}"
        if s1 % p or s2 % p or s3 % p:
            return f"spatial size {(s1, s2, s3)} not divisible by patch_size {p}"
        import jax

        if not opts.get("use_windowed") and jax.devices()[0].platform != "tpu":
            return "not on TPU (set factorize_options={'use_windowed': True} to force)"
        return None

    def _use_fused_windowed(self, out: Array) -> bool:
        # Default ON where eligible: the v2 row-blocked kernel beats the
        # fold -> flat kernel -> unfold path 2-3x at every stage scale on
        # v5e (PERFORMANCE.md).  Opt out with
        # ``factorize_options={"use_windowed": False}``.  Multi-device meshes
        # keep the kernel local per shard via its custom_partitioning rule
        # (ops/pallas/partitioning.py) — batch-sharded (dp) meshes shard
        # freely; spatial (sp) shardings get resharded around the call, so
        # sp users should prefer ``use_windowed: False`` (the flat kernel
        # partitions along the window axis instead).
        reason = self._fused_fallback_reason(out)
        if reason is None:
            return True
        opts = self.factorize_options or {}
        explicit = (
            opts.get("use_windowed") is False or opts.get("use_pallas") is False
        )
        if opts.get("explain") or (not explicit and reason not in _LOGGED_FALLBACKS):
            _LOGGED_FALLBACKS.add(reason)
            logger.info(
                "FactMixer %s falls back to the unfused factorization path "
                "(2-3x slower where the fused kernel applies): %s",
                self.name or "", reason,
            )
        return False

    def _split_shift_eligible(self) -> bool:
        """Per-shift processing is exact whenever the factorization treats
        matrices independently (any MatrixFactorization) and the activation
        is elementwise — it skips SWMatricize's batch concat/split and its
        peak-memory cost.  Opt-in (factorize_options={"split_shifts": True}):
        measured ~3% slower end-to-end on v5e (XLA fuses the concat well and
        per-shift kernel launches add overhead), but it halves the mixer's
        peak activation footprint, which matters for large-batch training."""
        from ..factorization.nmf import MatrixFactorization as _MF
        from ..ops.reshape import SWMatricize as _SW

        return (
            bool((self.factorize_options or {}).get("split_shifts"))
            and isinstance(self.reshape_op, _SW)
            and len(self.reshape_op.shifted_windows) > 1
            and isinstance(self.factorize_op, _MF)
        )

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # x: (B, *S, C)
        out = self.in_proj(x)
        if self._use_fused_windowed(out):
            # act commutes with the (permutation) fold, so apply it on the
            # volume and run the one-pass kernel per shift.
            out = self.act_fn(out)
            out = self._fused_windowed_call(out)
        elif self._split_shift_eligible():
            out = self.act_fn(out)  # elementwise: commutes with the fold
            acc = None
            for m in self.reshape_op.shifted_windows:
                z = m.inverse_forward(self.factorize_op(m.forward(out)))
                acc = z if acc is None else acc + z
            out = acc / len(self.reshape_op.shifted_windows)
        else:
            out = self.reshape_op.forward(out)
            out = self.act_fn(out)
            out = self.factorize_op(out)
            out = self.reshape_op.inverse_forward(out)
        out = self.out_proj(out)
        out = self.drop(out, deterministic=deterministic)
        return out


class FactorizerBlock(nn.Module):
    """Pre-norm residual block: ``x + fact(norm(x))``; ``x + mlp(norm(x))``.

    (reference: factorizer.py:60-77)
    """

    channels: int
    spatial_size: Sequence[int]
    norm: Any = LayerNorm
    dropout: float = 0.0
    mlp_ratio: float = 2
    reshape: Any = (Matricize, {"num_heads": 1, "grid_size": 1})
    act: Any = "relu"
    factorize: Any = NMF
    rank: Optional[int] = None
    compression: Optional[float] = None
    num_iters: Optional[int] = None
    num_grad_steps: Optional[int] = None
    init_method: Any = None
    solver: Any = None
    factorize_options: Any = None
    dtype: Any = None

    def setup(self) -> None:
        norm = partialize(self.norm)
        norm_kwargs = dtype_kwargs(self.norm, self.dtype)
        self.norm1 = norm(self.channels, **norm_kwargs)
        self.fact = FactMixer(
            self.channels,
            self.channels,
            self.spatial_size,
            reshape=self.reshape,
            act=self.act,
            factorize=self.factorize,
            dropout=self.dropout,
            rank=self.rank,
            compression=self.compression,
            num_iters=self.num_iters,
            num_grad_steps=self.num_grad_steps,
            init_method=self.init_method,
            solver=self.solver,
            factorize_options=self.factorize_options,
            dtype=self.dtype,
        )
        self.norm2 = norm(self.channels, **norm_kwargs)
        self.mlp = MLP(self.channels, ratio=self.mlp_ratio, dropout=self.dropout, dtype=self.dtype)

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = x + self.fact(self.norm1(x), deterministic=deterministic)
        y = None
        if not self.is_initializing():
            y = maybe_fused_prenorm_mlp(self.norm2, self.mlp, x, deterministic)
        if y is None:
            y = x + self.mlp(self.norm2(x), deterministic=deterministic)
        return y


class FactorizerStage(nn.Module):
    """One resolution stage: channel adapter + optional pos-embed + depth blocks.

    (reference: factorizer.py:80-122)
    """

    in_channels: int
    out_channels: int
    spatial_size: Sequence[int]
    depth: int = 1
    adapter: Any = (Linear, {"bias": False})
    pos_embed: Any = None
    dropout: float = 0.0
    norm: Any = LayerNorm
    mlp_ratio: float = 2
    reshape: Any = (Matricize, {"num_heads": 1, "grid_size": 1})
    act: Any = "relu"
    factorize: Any = NMF
    rank: Optional[int] = None
    compression: Optional[float] = None
    num_iters: Optional[int] = None
    num_grad_steps: Optional[int] = None
    init_method: Any = None
    solver: Any = None
    factorize_options: Any = None
    dtype: Any = None

    def setup(self) -> None:
        if self.in_channels != self.out_channels:
            adapter_kwargs = dtype_kwargs(self.adapter, self.dtype)
            self.adapter_ = partialize(self.adapter)(
                self.in_channels, self.out_channels, **adapter_kwargs
            )
        else:
            self.adapter_ = None

        if self.pos_embed is not None:
            self.pos_embed_ = partialize(self.pos_embed)(self.out_channels, tuple(self.spatial_size))
            self.pos_drop = nn.Dropout(rate=self.dropout)
        else:
            self.pos_embed_ = None

        self.blocks = [
            FactorizerBlock(
                self.out_channels,
                self.spatial_size,
                norm=self.norm,
                dropout=self.dropout,
                mlp_ratio=self.mlp_ratio,
                reshape=self.reshape,
                act=self.act,
                factorize=self.factorize,
                rank=self.rank,
                compression=self.compression,
                num_iters=self.num_iters,
                num_grad_steps=self.num_grad_steps,
                init_method=self.init_method,
                solver=self.solver,
                factorize_options=self.factorize_options,
                dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.depth)
        ]

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out = self.adapter_(x) if self.adapter_ is not None else x
        if self.pos_embed_ is not None:
            out = self.pos_embed_(out)
            out = self.pos_drop(out, deterministic=deterministic)
        for blk in self.blocks:
            out = blk(out, deterministic=deterministic)
        return out


class Factorizer(nn.Module):
    """Swin-Factorizer segmentation U-Net (reference: factorizer.py:125-171).

    A generic :class:`UNet` whose stage blocks are :class:`FactorizerStage`;
    only the bottleneck stage carries a positional embedding.
    """

    in_channels: int
    out_channels: int
    spatial_size: Sequence[int]
    encoder_depth: Sequence[int] = (1, 1, 1, 1, 1)
    encoder_width: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (1, 2, 2, 2, 2)
    decoder_depth: Sequence[int] = (1, 1, 1, 1)
    stem: Any = None
    downsample: Any = None
    upsample: Any = None
    head: Any = None
    pos_embed: Any = PositionalEmbedding
    num_deep_supr: Any = False
    data_format: str = "channels_first"
    # block-level options
    norm: Any = LayerNorm
    dropout: float = 0.0
    mlp_ratio: float = 2
    reshape: Any = (Matricize, {"num_heads": 1, "grid_size": 1})
    act: Any = "relu"
    factorize: Any = NMF
    rank: Optional[int] = None
    compression: Optional[float] = None
    num_iters: Optional[int] = None
    num_grad_steps: Optional[int] = None
    init_method: Any = None
    solver: Any = None
    factorize_options: Any = None
    dtype: Any = None
    remat: bool = False

    def setup(self) -> None:
        stem = self.stem
        if stem is None:
            from ..layers.basic import Conv

            stem = (Conv, {"kernel_size": 3, "padding": 1, "bias": False})

        block_kwargs = dict(
            norm=self.norm,
            dropout=self.dropout,
            mlp_ratio=self.mlp_ratio,
            reshape=self.reshape,
            act=self.act,
            factorize=self.factorize,
            rank=self.rank,
            compression=self.compression,
            num_iters=self.num_iters,
            num_grad_steps=self.num_grad_steps,
            init_method=self.init_method,
            solver=self.solver,
            factorize_options=self.factorize_options,
            dtype=self.dtype,
        )
        n_enc = len(self.encoder_depth)
        n_dec = len(self.decoder_depth)
        encoder_block = (n_enc - 1) * [(FactorizerStage, block_kwargs)]
        bottleneck_block = [(FactorizerStage, {"pos_embed": self.pos_embed, **block_kwargs})]
        decoder_block = n_dec * [(FactorizerStage, block_kwargs)]

        self.unet = UNet(
            self.in_channels,
            self.out_channels,
            spatial_dims=len(self.spatial_size),
            spatial_size=self.spatial_size,
            encoder_depth=self.encoder_depth,
            encoder_width=self.encoder_width,
            strides=self.strides,
            decoder_depth=self.decoder_depth,
            stem=stem,
            downsample=self.downsample,
            block=encoder_block + bottleneck_block + decoder_block,
            upsample=self.upsample,
            head=self.head,
            num_deep_supr=self.num_deep_supr,
            data_format=self.data_format,
            dtype=self.dtype,
            remat=self.remat,
        )

    def forward_features(self, x: Array, deterministic: bool = True) -> list[Array]:
        return self.unet.forward_features(x, deterministic=deterministic)

    def __call__(self, x: Array, train: bool = False):
        return self.unet(x, train=train)
