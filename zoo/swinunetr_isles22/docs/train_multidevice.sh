#!/bin/bash
# TPU-pod-ready entry point: run on every host of the slice (single-controller
# JAX initializes multi-host via jax.distributed inside the trainer).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m factorizer_tpu.bundle run --config_file configs/train.yaml --config_file configs/train_multidevice.yaml "$@"
