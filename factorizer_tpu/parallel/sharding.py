"""Parameter- and activation-sharding rules.

Replaces the reference's replicate-everything DDP with mesh-aware layouts:

* **DP**: params replicated, batch sharded over ``data``; XLA all-reduces
  gradients over ICI (the NCCL-allreduce analogue, inserted automatically).
* **TP**: Dense/conv kernels above a size threshold are sharded over
  ``model`` on their output-feature axis; XLA inserts the matching
  all-gathers/reduce-scatters.
* **SP** (spatial/window): the volume's first spatial axis is sharded over
  ``model``; GSPMD adds halo exchanges for convs and reshard points around
  the matricize reshapes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "param_sharding_rules",
    "param_leaf_rule",
    "input_sharding",
    "shard_variables",
    "place_global",
]


def param_leaf_rule(
    mesh: Mesh,
    model_axis: Optional[str] = "model",
    min_weight_size: int = 2**14,
):
    """The leaf -> NamedSharding rule behind :func:`param_sharding_rules`.

    Exposed separately so optimizer-state trees (whose momentum leaves mirror
    the parameter shapes) can be sharded with the SAME rule — a leaf's
    sharding depends only on its shape/size, so mu/nu land with their params
    and scalars/counters replicate.
    """
    has_model = model_axis is not None and model_axis in mesh.axis_names
    model_size = mesh.shape[model_axis] if has_model else 1

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        ndim = len(shape)
        size = 1
        for s in shape:
            size *= s
        if (
            has_model
            and model_size > 1
            and ndim >= 2
            and size >= min_weight_size
            and shape[-1] % model_size == 0
        ):
            spec = [None] * ndim
            spec[-1] = model_axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def param_sharding_rules(
    variables: Any,
    mesh: Mesh,
    model_axis: Optional[str] = "model",
    min_weight_size: int = 2**14,
):
    """A pytree of NamedShardings for the variables.

    Kernels whose last axis is divisible by the ``model`` axis size and whose
    total size exceeds ``min_weight_size`` are sharded over that axis
    (output-feature / tensor parallelism); everything else is replicated.
    """
    rule = param_leaf_rule(mesh, model_axis, min_weight_size)
    return jax.tree_util.tree_map(rule, variables)


def input_sharding(
    mesh: Mesh,
    ndim: int,
    data_axis: str = "data",
    spatial_axis: Optional[str] = None,
    data_format: str = "channels_first",
) -> NamedSharding:
    """Sharding for a model input batch.

    Batch over ``data_axis``; optionally the first spatial axis over
    ``spatial_axis`` (sequence/window parallelism).
    """
    spec: list = [None] * ndim
    spec[0] = data_axis if data_axis in mesh.axis_names else None
    if spatial_axis is not None and spatial_axis in mesh.axis_names:
        first_spatial = 2 if data_format == "channels_first" else 1
        spec[first_spatial] = spatial_axis
    return NamedSharding(mesh, P(*spec))


def shard_variables(variables: Any, shardings: Any) -> Any:
    """Place a variables pytree onto its shardings."""
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)


def place_global(value, sharding: NamedSharding):
    """Place a host-local array onto a (possibly cross-process) sharding.

    Every process must hold the SAME full ``value`` (same seed / same
    checkpoint / same loaded batch); each contributes only its addressable
    shards, so this works for shardings whose pieces live on other hosts —
    the placement path for TP-sharded parameters and spatially-sharded
    inputs in multi-host training.  Single-process, it is ``device_put``.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    value = np.asarray(value)
    return jax.make_array_from_callback(value.shape, sharding, lambda idx: value[idx])
