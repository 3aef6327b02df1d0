"""Checkpoint + logging utilities (reference: model_zoo/*/scripts/utils.py)."""

from factorizer_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from factorizer_tpu.utils.torch_import import import_torch_checkpoint  # noqa: F401


def log_model_info(variables) -> str:
    """Parameter-count banner (the LogModelInfoHandler analogue)."""
    import jax

    n = sum(a.size for a in jax.tree.leaves(variables.get("params", {})))
    msg = f"trainable parameters: {n / 1e6:.2f}M"
    print(msg)
    return msg
