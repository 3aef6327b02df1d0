"""Bundle runner CLI: ``python -m factorizer_tpu.bundle run ...``.

The workflow entry point replacing ``python -m monai.bundle run`` (reference:
model_zoo/factorizer_brats23/docs/train.sh:115-119): loads one or more YAML
config files (later files overlay earlier ones), applies ``key=value`` CLI
overrides, then resolves and executes the requested program ids in order.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence

from .parser import ConfigParser, load_config_files, merge_config, parse_override

__all__ = ["run", "main"]


def run(
    config_file: str | Sequence[str],
    run_id: str | Sequence[str] = "run",
    overrides: Optional[Sequence[str]] = None,
    **kwargs,
) -> ConfigParser:
    """Load config files, apply overrides, execute the program id(s)."""
    files = [config_file] if isinstance(config_file, str) else list(config_file)
    config = load_config_files(files)
    pairs = dict(parse_override(p) for p in (overrides or []))
    for k, v in {**pairs, **kwargs}.items():
        config = merge_config(config, {k: v})

    parser = ConfigParser(config)
    run_ids = [run_id] if isinstance(run_id, str) else list(run_id)
    for rid in run_ids:
        if rid in parser:
            parser.resolve(rid)
    return parser


def _normalize_cli_overrides(tokens: list[str]) -> list[str]:
    """Accept both override syntaxes: positional ``key=value`` and the
    reference CLI's ``--key value`` / ``--key=value`` pairs
    (``monai.bundle run`` forwards arbitrary ``--key value`` flags,
    reference docs/train.sh:115-119 — our docs/*.sh forward ``"$@"`` the
    same way)."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok.startswith("--"):
            key = tok[2:]
            if "=" in key:
                out.append(key)
            else:
                if i + 1 >= len(tokens) or tokens[i + 1].startswith("--"):
                    raise SystemExit(f"override flag --{key} is missing a value")
                out.append(f"{key}={tokens[i + 1]}")
                i += 1
        else:
            out.append(tok)
        i += 1
    return out


def force_platform() -> None:
    """Honor ``FTX_PLATFORM`` before any JAX backend initializes.

    In some environments the TPU plugin ignores the ``JAX_PLATFORMS`` env
    var, so CI / subprocess flows that must run on CPU (e.g. the reproduce
    harness and its bundle invocations) set ``FTX_PLATFORM=cpu`` and we
    apply it via ``jax.config``, which the plugin does respect.  Must run
    before the first backend-touching JAX call in the process.
    """
    import os

    plat = os.environ.get("FTX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main(argv: Optional[Sequence[str]] = None) -> None:
    """CLI: ``python -m factorizer_tpu.bundle run --config_file F [overrides]``.

    Overrides use either positional ``key=value`` or the reference CLI's
    ``--key value`` / ``--key=value`` forms.  Parsed with a manual scan —
    argparse's positional/optional intermixing separates ``--key`` flags
    from their values, mispairing the overrides.
    """
    force_platform()
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] != "run":
        raise SystemExit(
            "usage: factorizer_tpu.bundle run --config_file FILE "
            "[--config_file OVERLAY ...] [--run_id ID ...] [key=value | --key value ...]"
        )
    config_files: list[str] = []
    run_ids: list[str] = []
    override_tokens: list[str] = []
    i = 1
    while i < len(argv):
        tok = argv[i]
        if tok in ("--config_file", "--run_id"):
            if i + 1 >= len(argv):
                raise SystemExit(f"{tok} is missing a value")
            (config_files if tok == "--config_file" else run_ids).append(argv[i + 1])
            i += 2
        elif tok.startswith("--config_file="):
            config_files.append(tok.split("=", 1)[1])
            i += 1
        elif tok.startswith("--run_id="):
            run_ids.append(tok.split("=", 1)[1])
            i += 1
        else:
            override_tokens.append(tok)
            i += 1
    if not config_files:
        raise SystemExit("at least one --config_file is required")
    run(
        config_files,
        run_id=run_ids or ["initialize", "run"],
        overrides=_normalize_cli_overrides(override_tokens),
    )


if __name__ == "__main__":
    main()
