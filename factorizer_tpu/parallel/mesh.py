"""Device-mesh construction and sharding helpers.

The TPU-native replacement for the reference's DDP/NCCL layer
(reference: model_zoo/*/configs/train_multigpu.yaml:1-39): a
``jax.sharding.Mesh`` over the chips with named axes, ``NamedSharding``
annotations, and XLA-inserted collectives riding ICI.  Multi-host init goes
through ``jax.distributed.initialize`` (single-controller JAX).

Mesh axes used by this framework:
    ``data``   — batch (data parallel; gradient psum over ICI)
    ``model``  — tensor/sequence parallel: wide Dense kernels and/or one
                 spatial axis of the volume (halo exchange handled by GSPMD)
"""

from __future__ import annotations

import contextlib
from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_parallel_mesh",
    "model_parallel_mesh",
    "batch_sharding",
    "replicated",
    "local_device_count",
    "initialize_distributed",
    "process_is_primary",
    "data_process_groups",
]


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    axes: Mapping[str, int],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh with named axes from (a prefix of) the available devices.

    Args:
        axes: ordered mapping axis-name -> size; an axis size of -1 absorbs
            the remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"Mesh needs {total} devices, only {len(devices)} available.")
    grid = np.array(devices[:total]).reshape(sizes)
    return Mesh(grid, names)


def data_parallel_mesh(n: Optional[int] = None) -> Mesh:
    """A 1-D ``data`` mesh over n (default: all) local devices."""
    devices = jax.devices()
    n = len(devices) if n is None else n
    return make_mesh({"data": n}, devices)


def model_parallel_mesh(
    data: int = -1, model: Optional[int] = None, model_across_processes: bool = True
) -> Mesh:
    """A 2-D ``{data, model}`` mesh; by default the ``model`` axis spans
    process boundaries (one model shard per host) so TP parameter shards and
    spatially-sharded volumes ride the inter-host links while each host's
    local devices carry different batch rows.

    With ``model_across_processes=False`` the layout is the transpose:
    ``data`` spans processes (per-host datalist shards) and ``model`` stays
    host-local.
    """
    devices = jax.devices()
    n_proc = jax.process_count()
    if model is None:
        # one model shard per host; single-host runs still get a model axis
        # of 2 so the overlay is meaningful on one multi-chip VM
        model = n_proc if n_proc > 1 else (2 if len(devices) % 2 == 0 else 1)
    data = len(devices) // model if data == -1 else data
    if data * model != len(devices):
        raise ValueError(f"{data}x{model} mesh over {len(devices)} devices")
    grid = np.array(devices).reshape(n_proc, -1)  # [process, local_device]
    if model_across_processes:
        # mesh[d, m] = process m's local device d
        if model % n_proc != 0 or (n_proc > 1 and data > grid.shape[1]):
            raise ValueError("model axis must be a multiple of the process count")
        grid = grid.T.reshape(data, model)
    else:
        grid = grid.reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_process_groups(mesh: Mesh, data_axis: str = "data") -> tuple[int, int]:
    """How this process should shard the datalist under ``mesh``.

    Returns ``(num_groups, group_index)``: processes whose devices cover the
    same set of ``data``-axis indices form one loader group and must load
    identical data (their devices hold different model/spatial shards of the
    same rows); groups with disjoint data indices load disjoint datalist
    partitions (the DistributedSampler analogue).  Pure-DP meshes reduce to
    ``(process_count, process_index)``; model-axis-across-hosts meshes reduce
    to ``(1, 0)``.
    """
    if data_axis not in mesh.axis_names:
        return 1, 0
    axis_num = list(mesh.axis_names).index(data_axis)
    by_process: dict[int, set] = {}
    it = np.ndindex(*mesh.devices.shape)
    for idx in it:
        dev = mesh.devices[idx]
        by_process.setdefault(dev.process_index, set()).add(idx[axis_num])
    groups = sorted({tuple(sorted(s)) for s in by_process.values()})
    mine = tuple(sorted(by_process[jax.process_index()]))
    return len(groups), groups.index(mine)


def batch_sharding(mesh: Mesh, axis: str = "data", ndim: int = 5) -> NamedSharding:
    """Shard the leading (batch) axis over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (no-op on a single process).

    Must run before any other JAX call: touching the backend first (even
    ``jax.process_count()``) would initialize single-process and make
    ``jax.distributed.initialize`` a silent no-op.
    """
    if kwargs:
        jax.distributed.initialize(**kwargs)
        return
    # Auto mode (TPU pod / cluster env vars): harmless if single-process.
    with contextlib.suppress(RuntimeError, ValueError):
        jax.distributed.initialize()


def process_is_primary() -> bool:
    """True on the host that should log/checkpoint (rank-0 analogue)."""
    return jax.process_index() == 0
