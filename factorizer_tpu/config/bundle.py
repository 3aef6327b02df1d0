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


def main(argv: Optional[Sequence[str]] = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    ap = argparse.ArgumentParser(prog="factorizer_tpu.bundle")
    sub = ap.add_subparsers(dest="command", required=True)
    runp = sub.add_parser("run", help="execute a bundle program")
    runp.add_argument("--config_file", action="append", required=True)
    runp.add_argument("--run_id", action="append", default=None)
    runp.add_argument("overrides", nargs="*", help="key=value overrides")
    args = ap.parse_args(argv)

    if args.command == "run":
        run(
            args.config_file,
            run_id=args.run_id or ["initialize", "run"],
            overrides=args.overrides,
        )


if __name__ == "__main__":
    main()
