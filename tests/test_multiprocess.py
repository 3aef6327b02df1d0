"""True multi-process distributed test: 2 CPU processes via jax.distributed.

The jax.distributed two-process CPU analogue of the reference's torchrun
flow (reference: model_zoo/factorizer_brats23/docs/train_multigpu.sh:108-115
+ configs/train_multigpu.yaml): each process initializes against a shared
coordinator, shards the datalist per-process (DistributedSampler analogue),
runs a psum collective across BOTH processes' devices, and gates
checkpoint/log writes on rank 0.  Round-1 gap: all distributed tests were
single-process over virtual devices, so ``initialize_distributed`` /
``partition_datalist`` / rank-0 gating were never exercised across a real
process boundary.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = r"""
import json, os, sys

# Each process gets 2 virtual CPU devices -> 4 global devices over 2 procs.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["FTX_REPO"])
from factorizer_tpu.parallel.mesh import (
    initialize_distributed, make_mesh, process_is_primary,
)
from factorizer_tpu.data.dataset import partition_datalist

rank = int(os.environ["FTX_RANK"])
initialize_distributed(
    coordinator_address=os.environ["FTX_COORD"],
    num_processes=2,
    process_id=rank,
)

assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank

# per-process datalist shard (the DistributedSampler analogue)
datalist = [{"id": i} for i in range(10)]
shard = partition_datalist(datalist, jax.process_count(), jax.process_index())
assert len(shard) == 5
assert all(d["id"] % 2 == rank for d in shard)

# a cross-process collective over the global mesh
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh({"data": jax.device_count()})
local = jnp.ones((jax.local_device_count(), 4)) * (rank + 1)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local
)
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(arr)
# devices carry 1s (rank 0) and 2s (rank 1): sum = (1+2) * 2 local dev * 4
assert float(total) == 24.0, float(total)

# rank-0 gating
primary = process_is_primary()
assert primary == (rank == 0)
out_dir = os.environ["FTX_OUT"]
if primary:
    with open(os.path.join(out_dir, "ckpt.json"), "w") as f:
        json.dump({"step": 1}, f)

print(json.dumps({"rank": rank, "ok": True, "primary": primary}))
"""


def test_two_process_distributed_init_and_collective(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    env_base = {
        **os.environ,
        "FTX_REPO": str(Path(__file__).resolve().parent.parent),
        "FTX_COORD": f"localhost:{port}",
        "FTX_OUT": str(tmp_path),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "FTX_RANK": str(r)},
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert {o["rank"] for o in outs} == {0, 1}
    assert all(o["ok"] for o in outs)
    # exactly the primary process wrote the checkpoint
    assert (tmp_path / "ckpt.json").exists()
    assert sum(o["primary"] for o in outs) == 1


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
