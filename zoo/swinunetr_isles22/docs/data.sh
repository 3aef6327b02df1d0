#!/bin/bash
# TPU-pod-ready entry point: run on every host of the slice (single-controller
# JAX initializes multi-host via jax.distributed inside the trainer).
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/make_datalist.py --data_dir "${DATA_DIR:?set DATA_DIR}" --output configs/datalist.json
