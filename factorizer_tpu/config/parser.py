"""Declarative YAML config system with reference / expression / instantiate /
overlay semantics.

The workflow layer's replacement for MONAI-bundle config parsing (the
reference's entire L4 runs on it; reference:
model_zoo/factorizer_brats23/configs/train.yaml + docs/train.sh:115-119).
Supported verbs:

* ``@id`` — reference another (resolved) config item; ``#`` walks sub-keys
  (``@solver#lr``) and list indices.
* ``$expr`` — python expression evaluated with numpy/jax/this framework in
  scope; embedded ``@id`` references are substituted first.
* ``{_target_: Name, ...}`` — instantiate a class/callable from the
  component registry or a dotted import path; ``_disabled_: true`` skips.
* overlays — later config files/CLI pairs deep-merge over earlier ones with
  ``key#sub`` paths (``docs/train_multigpu.sh``-style layering).
"""

from __future__ import annotations

import importlib
import re
from pathlib import Path
from typing import Any, Mapping, Optional, Sequence

import yaml

__all__ = ["ConfigParser", "load_config_files", "merge_config", "parse_override"]

_REF = re.compile(r"@([A-Za-z_][\w#]*)")


def _default_registry() -> dict[str, Any]:
    """Component name -> class map: framework public API + transforms + train."""
    import factorizer_tpu as ftx
    from factorizer_tpu.data import dataset as _ds
    from factorizer_tpu.data import transforms as _tf
    from factorizer_tpu import train as _train

    reg: dict[str, Any] = {}
    for mod in (_tf, _ds, _train):
        for name in dir(mod):
            if not name.startswith("_"):
                obj = getattr(mod, name)
                if callable(obj):
                    reg.setdefault(name, obj)
    for name in dir(ftx):
        if not name.startswith("_"):
            obj = getattr(ftx, name)
            if callable(obj):
                reg.setdefault(name, obj)
    return reg


def _eval_globals() -> dict[str, Any]:
    import glob as _glob
    import math
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    import factorizer_tpu as ftx

    return {
        "np": np,
        "numpy": np,
        "jnp": jnp,
        "jax": jax,
        "math": math,
        "os": os,
        "glob": _glob,
        "ftx": ftx,
        "sorted": sorted,
        "len": len,
        "range": range,
        "list": list,
        "dict": dict,
        "str": str,
        "int": int,
        "float": float,
        "bool": bool,
        "min": min,
        "max": max,
    }


def merge_config(base: dict, overlay: Mapping) -> dict:
    """Deep-merge ``overlay`` into ``base`` (dicts merge, other values replace)."""
    out = dict(base)
    for k, v in overlay.items():
        if "#" in k:
            top, rest = k.split("#", 1)
            sub = dict(out.get(top, {})) if isinstance(out.get(top), Mapping) else {}
            out[top] = merge_config(sub, {rest: v})
        elif isinstance(v, Mapping) and isinstance(out.get(k), Mapping):
            out[k] = merge_config(dict(out[k]), v)
        else:
            out[k] = v
    return out


def parse_override(pair: str) -> tuple[str, Any]:
    """Parse a ``key=value`` CLI override (value via YAML)."""
    key, _, raw = pair.partition("=")
    return key.strip(), yaml.safe_load(raw)


def load_config_files(paths: Sequence[str | Path]) -> dict:
    config: dict = {}
    for p in paths:
        with open(p) as f:
            overlay = yaml.safe_load(f) or {}
        config = merge_config(config, overlay)
    return config


class ConfigParser:
    """Lazily resolves a bundle-style config tree into live objects."""

    def __init__(
        self,
        config: Mapping[str, Any],
        registry: Optional[Mapping[str, Any]] = None,
        globals_: Optional[Mapping[str, Any]] = None,
    ) -> None:
        self.config = dict(config)
        self.registry = dict(registry) if registry is not None else _default_registry()
        # ``$`` expressions see the ``_target_`` registry names too, so
        # helpers like ``$partition_datalist(...)`` (train_multidevice.yaml)
        # resolve without module paths; core eval names win on collision.
        self.globals = {**self.registry, **_eval_globals()}
        if globals_:
            self.globals.update(globals_)
        self._cache: dict[str, Any] = {}
        self._resolving: set[str] = set()

    # -- raw navigation

    def _get_raw(self, path: str) -> Any:
        node: Any = self.config
        for part in path.split("#"):
            if isinstance(node, Mapping):
                node = node[part]
            elif isinstance(node, (list, tuple)):
                node = node[int(part)]
            else:
                raise KeyError(path)
        return node

    def __contains__(self, path: str) -> bool:
        try:
            self._get_raw(path)
            return True
        except (KeyError, IndexError, ValueError):
            return False

    # -- resolution

    def resolve(self, path: str) -> Any:
        if path in self._cache:
            return self._cache[path]
        if path in self._resolving:
            raise ValueError(f"Circular config reference at {path!r}.")
        self._resolving.add(path)
        try:
            value = self._resolve_value(self._get_raw(path))
        finally:
            self._resolving.discard(path)
        self._cache[path] = value
        return value

    __getitem__ = resolve

    def get(self, path: str, default: Any = None) -> Any:
        try:
            return self.resolve(path)
        except (KeyError, IndexError):
            return default

    def _resolve_value(self, v: Any) -> Any:
        if isinstance(v, Mapping):
            if v.get("_disabled_"):
                return None
            if "_target_" in v:
                return self._instantiate(v)
            return {k: self._resolve_value(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [self._resolve_value(x) for x in v]
        if isinstance(v, str):
            if v.startswith("@"):
                return self.resolve(v[1:])
            if v.startswith("$"):
                return self._evaluate(v[1:])
            return v
        return v

    def _instantiate(self, spec: Mapping[str, Any]) -> Any:
        target = spec["_target_"]
        fn = self._lookup(target)
        args = [self._resolve_value(a) for a in spec.get("_args_", [])]
        kwargs = {
            k: self._resolve_value(v)
            for k, v in spec.items()
            if k not in ("_target_", "_args_", "_disabled_")
        }
        return fn(*args, **kwargs)

    def _lookup(self, target: str) -> Any:
        if target in self.registry:
            return self.registry[target]
        if "." in target:
            mod_name, _, attr = target.rpartition(".")
            mod = importlib.import_module(mod_name)
            return getattr(mod, attr)
        raise KeyError(f"Unknown _target_ {target!r} (not in registry, not importable).")

    def _evaluate(self, expr: str) -> Any:
        env: dict[str, Any] = {}

        def sub(m: re.Match) -> str:
            name = f"__ref_{len(env)}"
            env[name] = self.resolve(m.group(1))
            return name

        py = _REF.sub(sub, expr)
        return eval(py, dict(self.globals), env)  # noqa: S307 — bundle exprs are trusted config
