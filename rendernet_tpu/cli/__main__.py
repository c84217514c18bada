"""Dispatcher: ``python -m rendernet_tpu.cli <command> [args...]``."""
from __future__ import annotations

import sys

COMMANDS = {
    "render": "rendernet_tpu.cli.demo",
    "train-shader": "rendernet_tpu.cli.train_shader",
    "train-texture": "rendernet_tpu.cli.train_texture",
    "reconstruct": "rendernet_tpu.cli.reconstruct",
    "pack-tar": "rendernet_tpu.cli.pack_tar",
    "convert": "rendernet_tpu.cli.convert",
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("commands:")
        for name in COMMANDS:
            print(f"  {name}")
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd!r}; one of {list(COMMANDS)}", file=sys.stderr)
        return 2
    from rendernet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import importlib

    module = importlib.import_module(COMMANDS[cmd])
    return module.main(rest)


if __name__ == "__main__":
    sys.exit(main())
