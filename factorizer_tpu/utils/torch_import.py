"""Import reference (PyTorch) model_zoo checkpoints into this framework.

Converts a torch ``state_dict`` of the reference Factorizer / Deconver / UNet
(reference: factorizer/factorizer.py, deconver.py, unet.py; checkpoints from
model_zoo/*/models/*.pt) into this framework's Flax variables, handling the
layout differences:

* Conv(Nd) weight ``(O, I, *k)``      -> kernel ``(*k, I, O)``
* ConvTranspose weight ``(I, O, *k)`` -> kernel ``(*k, I, O)`` **spatially
  flipped** (flax ConvTranspose correlates on the dilated input)
* Conv1d "Linear" weight ``(O, I, 1)``-> Dense kernel ``(I, O)``
* LayerNorm/GroupNorm weight          -> scale
* positional embedding ``(1, C, *S)`` -> ``(1, *S, C)``
* NMF init buffers u0/v0              -> the ``buffers`` collection

Checkpoint parity lets model_zoo weights reproduce reference Dice without
retraining (SURVEY.md §7 "checkpoint compatibility").
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

__all__ = ["convert_state_dict", "import_torch_checkpoint"]


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # (O, I, *k) -> (*k, I, O)
    nd = w.ndim - 2
    return np.transpose(w, (*range(2, 2 + nd), 1, 0))


def _tconv_kernel(w: np.ndarray) -> np.ndarray:
    # (I, O, *k) -> (*k, I, O), spatially flipped
    nd = w.ndim - 2
    out = np.transpose(w, (*range(2, 2 + nd), 0, 1))
    return out[(slice(None, None, -1),) * nd].copy()


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    # Conv1d (O, I, 1) or Linear (O, I) -> (I, O)
    if w.ndim == 3:
        w = w[:, :, 0]
    return np.ascontiguousarray(w.T)


def _stage_rules(dst_stage: str) -> list[tuple[str, Any]]:
    """Translation rules for one FactorizerStage/DeconverStage subtree."""
    return [
        # channel adapter
        (r"adapter\.linear\.weight$", (f"{dst_stage}.adapter_.linear.kernel", _linear_kernel)),
        (r"adapter\.linear\.bias$", (f"{dst_stage}.adapter_.linear.bias", None)),
        # positional embedding (bottleneck only)
        (
            r"pos_embed\.pos$",
            (
                f"{dst_stage}.pos_embed_.pos",
                lambda w: np.moveaxis(w, 1, -1),
            ),
        ),
        # block norms
        (r"blocks\.(\d+)\.norm(\d)\.norm\.weight$",
         (f"{dst_stage}.block{{0}}.norm{{1}}.norm.scale", None)),
        (r"blocks\.(\d+)\.norm(\d)\.norm\.bias$",
         (f"{dst_stage}.block{{0}}.norm{{1}}.norm.bias", None)),
        # FactMixer
        (r"blocks\.(\d+)\.fact\.in_proj\.linear\.weight$",
         (f"{dst_stage}.block{{0}}.fact.in_proj.linear.kernel", _linear_kernel)),
        (r"blocks\.(\d+)\.fact\.out_proj\.linear\.weight$",
         (f"{dst_stage}.block{{0}}.fact.out_proj.linear.kernel", _linear_kernel)),
        (r"blocks\.(\d+)\.fact\.out_proj\.linear\.bias$",
         (f"{dst_stage}.block{{0}}.fact.out_proj.linear.bias", None)),
        (r"blocks\.(\d+)\.fact\.factorize\.init\.(u0|v0)$",
         (f"BUFFERS:{dst_stage}.block{{0}}.fact.factorize_op.initializer.{{1}}", None)),
        # DeconvMixer
        (r"blocks\.(\d+)\.dcm\.in_proj\.linear\.weight$",
         (f"{dst_stage}.block{{0}}.dcm.in_proj.linear.kernel", _linear_kernel)),
        (r"blocks\.(\d+)\.dcm\.out_proj\.linear\.weight$",
         (f"{dst_stage}.block{{0}}.dcm.out_proj.linear.kernel", _linear_kernel)),
        (r"blocks\.(\d+)\.dcm\.out_proj\.linear\.bias$",
         (f"{dst_stage}.block{{0}}.dcm.out_proj.linear.bias", None)),
        (r"blocks\.(\d+)\.dcm\.deconv\.init\.h0$",
         (f"{dst_stage}.block{{0}}.dcm.deconv.h0", None)),
        (r"blocks\.(\d+)\.dcm\.deconv\.init\.linear\.linear\.weight$",
         (f"{dst_stage}.block{{0}}.dcm.deconv.linear.linear.kernel", _linear_kernel)),
        (r"blocks\.(\d+)\.dcm\.deconv\.init\.linear\.linear\.bias$",
         (f"{dst_stage}.block{{0}}.dcm.deconv.linear.linear.bias", None)),
        # MLP (Sequential: 0 = fc1, 3 = fc2)
        (r"blocks\.(\d+)\.mlp\.block\.0\.linear\.weight$",
         (f"{dst_stage}.block{{0}}.mlp.fc1.linear.kernel", _linear_kernel)),
        (r"blocks\.(\d+)\.mlp\.block\.0\.linear\.bias$",
         (f"{dst_stage}.block{{0}}.mlp.fc1.linear.bias", None)),
        (r"blocks\.(\d+)\.mlp\.block\.3\.linear\.weight$",
         (f"{dst_stage}.block{{0}}.mlp.fc2.linear.kernel", _linear_kernel)),
        (r"blocks\.(\d+)\.mlp\.block\.3\.linear\.bias$",
         (f"{dst_stage}.block{{0}}.mlp.fc2.linear.bias", None)),
    ]


def convert_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """Torch reference state_dict -> ``{"params": ..., "buffers": ...}``.

    Unmatched keys raise, so silent drift is impossible.
    """
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }

    rules: list[tuple[str, tuple[str, Any]]] = [
        (r"^stem\.weight$", ("unet.stem.conv.kernel", _conv_kernel)),
        (r"^stem\.bias$", ("unet.stem.conv.bias", None)),
        (r"^encoder\.blocks\.(\d+)\.downsample\.weight$",
         ("unet.down{0}.conv.kernel", _conv_kernel)),
        (r"^encoder\.blocks\.(\d+)\.downsample\.bias$", ("unet.down{0}.conv.bias", None)),
        (r"^decoder\.blocks\.(\d+)\.upsample\.weight$",
         ("unet.up{0}.conv.kernel", _tconv_kernel)),
        (r"^decoder\.blocks\.(\d+)\.upsample\.bias$", ("unet.up{0}.conv.bias", None)),
        (r"^head\.weight$", ("unet.head.conv.kernel", _conv_kernel)),
        (r"^head\.bias$", ("unet.head.conv.bias", None)),
        (r"^heads\.(\d+)\.weight$", ("unet.head{0}.conv.kernel", _conv_kernel)),
        (r"^heads\.(\d+)\.bias$", ("unet.head{0}.conv.bias", None)),
    ]
    # stage subtrees: encoder.blocks.{i}.block.X -> unet.enc{i}.X
    stage_rules_enc = _stage_rules("unet.enc{S}")
    stage_rules_dec = _stage_rules("unet.dec{S}")

    params: dict = {}
    buffers: dict = {}
    unmatched: list[str] = []

    def try_stage(key: str) -> bool:
        m = re.match(r"^(encoder|decoder)\.blocks\.(\d+)\.block\.(.+)$", key)
        if not m:
            return False
        side, idx, rest = m.group(1), m.group(2), m.group(3)
        rules_ = stage_rules_enc if side == "encoder" else stage_rules_dec
        for pat, (dst, fn) in rules_:
            mm = re.match(pat, rest)
            if mm:
                dst_path = dst.replace("{S}", idx)
                for gi, g in enumerate(mm.groups()):
                    dst_path = dst_path.replace(f"{{{gi}}}", g)
                value = sd[key] if fn is None else fn(sd[key])
                if dst_path.startswith("BUFFERS:"):
                    _set(buffers, dst_path[len("BUFFERS:"):].split("."), value)
                else:
                    _set(params, dst_path.split("."), value)
                return True
        return False

    for key in sd:
        if try_stage(key):
            continue
        for pat, (dst, fn) in rules:
            m = re.match(pat, key)
            if m:
                dst_path = dst
                for gi, g in enumerate(m.groups()):
                    dst_path = dst_path.replace(f"{{{gi}}}", g)
                _set(params, dst_path.split("."), sd[key] if fn is None else fn(sd[key]))
                break
        else:
            unmatched.append(key)

    if unmatched:
        raise ValueError(f"Unmapped reference checkpoint keys: {unmatched[:10]}...")
    out: dict = {"params": params}
    if buffers:
        out["buffers"] = buffers
    return out


def import_torch_checkpoint(path_or_state_dict, template: Any = None) -> dict:
    """Load a reference ``.pt`` checkpoint (or a state_dict) as Flax variables.

    ``template`` (optional): a variables pytree to validate shapes against.
    """
    if isinstance(path_or_state_dict, (str, bytes)) or hasattr(path_or_state_dict, "__fspath__"):
        import torch

        payload = torch.load(path_or_state_dict, map_location="cpu", weights_only=False)
        state_dict = payload.get("network", payload.get("state_dict", payload)) if isinstance(payload, dict) else payload
        if hasattr(state_dict, "state_dict"):
            state_dict = state_dict.state_dict()
    else:
        state_dict = path_or_state_dict

    variables = convert_state_dict(state_dict)
    if template is not None:
        import jax

        def check(path, t):
            node: Any = variables
            for p in path:
                node = node[p]
            if tuple(node.shape) != tuple(t.shape):
                raise ValueError(f"shape mismatch at {'.'.join(path)}: {node.shape} vs {t.shape}")

        def walk(tree, path=()):
            if isinstance(tree, Mapping):
                for k, v in tree.items():
                    walk(v, (*path, k))
            else:
                check(path, tree)

        walk(jax.tree.map(lambda a: a, template))
    return variables
