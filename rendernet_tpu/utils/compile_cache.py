"""Persistent XLA compilation cache for CLI entry points.

The shader/texture/recon programs take tens of seconds of XLA compile per
jit specialization (25-block res stacks); the reference pays the analogous
TF graph-build cost on every process start. Enabling jax's persistent
compilation cache makes repeat CLI invocations (same shapes/flags) load
compiled executables from disk instead.

Opt out with RENDERNET_TPU_NO_COMPILE_CACHE=1 or override the location
with RENDERNET_TPU_COMPILE_CACHE=<dir>.
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "rendernet_tpu", "xla"
)


def enable_compilation_cache() -> str | None:
    """Best-effort enable; returns the cache dir or None when disabled.

    When jax hasn't been imported yet (the CLI dispatcher calls this
    before any command parses its args), this only sets jax's config env
    vars — no jax import, so ``--help`` and pure-host commands like
    pack-tar stay fast. Once jax is already loaded, it updates the live
    config instead (env vars are read at import time)."""
    import sys

    if os.environ.get("RENDERNET_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get("RENDERNET_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        if "jax" in sys.modules:
            jax = sys.modules["jax"]
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # Cache everything that took meaningful compile time (default
            # thresholds skip small programs; our CLI programs are large,
            # but keep tiny helpers out of the cache).
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        else:
            os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
            os.environ.setdefault(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0"
            )
        return cache_dir
    except Exception:
        return None
