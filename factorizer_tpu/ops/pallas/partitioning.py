"""GSPMD partitioning for the fused Pallas kernels.

GSPMD cannot partition a bare custom call, so without help the fused kernels
would force their operands replicated — the flagship would lose its main
optimization exactly when scaling out (the round-1 gap).  The kernels are
batched-independent ops, so we teach the partitioner their sharding rule via
``jax.experimental.custom_partitioning``:

* any *batch* dimension may be sharded arbitrarily (each device runs the
  kernel on its local slice);
* the *solve* dimensions (the trailing matrix axes of the flat kernel; every
  non-batch axis of the windowed kernel) must be replicated — the partition
  callback proposes resharding when a user sharding violates this, and
  GSPMD inserts the collectives.

This is the TPU-native analogue of the reference's DDP hot path
(train_multigpu.yaml:3-6): the kernel runs unchanged per shard and XLA owns
the communication.
"""

from __future__ import annotations

import string
from typing import Callable, Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["make_batched_partitioned", "make_mlp_bwd_partitioned", "multi_device"]


def multi_device() -> bool:
    return len(jax.devices()) > 1


def _batch_only_spec(mesh, sharding, ndim: int, n_batch: int) -> NamedSharding:
    """The operand/result sharding: user's spec on batch dims, rest replicated."""
    spec = list(sharding.spec) if sharding is not None else []
    spec += [None] * (ndim - len(spec))
    for i in range(n_batch, ndim):
        spec[i] = None
    return NamedSharding(mesh, P(*spec))


def make_batched_partitioned(
    fn: Callable,
    n_batch_dims: int,
    n_operands: int,
    operand_ranks: Sequence[int],
    n_batched_operands: int = 1,
    result_rank: int | None = None,
) -> Callable:
    """Wrap ``fn(x, [g,] *consts) -> y`` so GSPMD shards along batch dims.

    Args:
        fn: the local computation; the first ``n_batched_operands`` operands
            share batched leading dims, the rest are replicated constants.
            The result has the batch dims leading.
        n_batch_dims: how many leading dims of the batched operands (and the
            result) are batch (independent) dims.
        n_operands: total operand count.
        operand_ranks: rank of each operand (used to build the einsum-like
            Shardy rule).
        result_rank: rank of the result when it differs from the first
            operand's (e.g. a per-batch reduction output).

    Returns:
        The partitioned callable with the same signature as ``fn``.
    """
    letters = iter(string.ascii_lowercase)
    batch_factors = [next(letters) for _ in range(n_batch_dims)]

    def fresh_factors(n: int) -> list[str]:
        return [next(letters) for _ in range(n)]

    maps: list[str] = []
    need_replication: list[str] = []
    for k, rank in enumerate(operand_ranks):
        if k < n_batched_operands:
            solve = fresh_factors(rank - n_batch_dims)
            maps.append(" ".join(batch_factors + solve))
        else:
            solve = fresh_factors(rank)
            maps.append(" ".join(solve))
        need_replication += solve
    # The result shares only the batch factors (its non-batch dims may have
    # different sizes than the input's, e.g. lane-packed kernel outputs).
    out_rank = operand_ranks[0] if result_rank is None else result_rank
    out_solve = fresh_factors(out_rank - n_batch_dims)
    need_replication += out_solve
    out_map = " ".join(batch_factors + out_solve)
    rule = ", ".join(maps) + " -> " + out_map

    wrapped = custom_partitioning(fn)

    def infer(mesh, arg_shapes, result_shape):
        return _batch_only_spec(
            mesh, arg_shapes[0].sharding, len(result_shape.shape), n_batch_dims
        )

    def partition(mesh, arg_shapes, result_shape):
        replicated = NamedSharding(mesh, P())
        arg_shardings = tuple(
            _batch_only_spec(
                mesh, arg_shapes[0].sharding, len(arg_shapes[k].shape), n_batch_dims
            )
            if k < n_batched_operands
            else replicated
            for k in range(n_operands)
        )
        out_sharding = _batch_only_spec(
            mesh, arg_shapes[0].sharding, len(result_shape.shape), n_batch_dims
        )
        return mesh, fn, out_sharding, arg_shardings

    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=tuple(need_replication),
    )
    return wrapped


def make_mlp_bwd_partitioned(fn: Callable, rule: str, n_args: int = 11) -> Callable:
    """Partition a fused-MLP backward pass for row-sharded activations.

    ``fn(xp, gp, *consts) -> (dxp, *param_cotangents)``: the first two
    operands and the first result share a shardable leading rows dim; every
    other operand is a replicated constant.  The six parameter cotangents
    are reductions over rows, so each shard computes a partial sum and the
    partition body ``psum``s them over the axes sharding the rows dim (the
    TPU-native analogue of DDP's gradient all-reduce).  A Shardy reduction
    factor cannot also appear in a result mapping (dxp carries the rows
    factor), so the ``rule`` marks every non-rows factor need-replication
    and the psum lives in the partition body.  ``rule`` must use factor
    ``r`` for rows and only ``l``/``l2``/``o``/``p`` elsewhere (both kernel
    layouts share that factor vocabulary).
    """
    wrapped = custom_partitioning(fn)

    def _row(mesh, arg_shapes):
        return _batch_only_spec(mesh, arg_shapes[0].sharding, 2, 1)

    def infer(mesh, arg_shapes, result_shape):
        row = _row(mesh, arg_shapes)
        rep = NamedSharding(mesh, P())
        return (row,) + (rep,) * 6

    def partition(mesh, arg_shapes, result_shape):
        row = _row(mesh, arg_shapes)
        rep = NamedSharding(mesh, P())
        arg_shardings = (row, row) + (rep,) * (n_args - 2)
        out_shardings = (row,) + (rep,) * 6
        axes = row.spec[0] if row.spec else None

        def lower_fn(*args):
            outs = fn(*args)
            if axes:
                return (outs[0],) + tuple(jax.lax.psum(o, axes) for o in outs[1:])
            return outs

        return mesh, lower_fn, out_shardings, arg_shardings

    # Every non-rows factor is need-replication; Shardy wants them ordered
    # by first appearance in the rule.
    seen: list[str] = []
    for tok in rule.replace(",", " ").replace("->", " ").split():
        if tok != "r" and tok not in seen:
            seen.append(tok)
    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=tuple(seen),
    )
    return wrapped
