"""Shared loader for the native/ shared libraries.

One copy of the build-on-first-use + ctypes-load idiom (lock, `make -C
native/ <target>` fallback build, CDLL, prototype setup) serving every
native module; callers degrade gracefully to their pure-Python paths
when no toolchain or .so exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional

__all__ = ["NativeLoader", "NATIVE_DIR"]

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


class NativeLoader:
    """Lazily build+load ``native/<so_name>``; ``setup(lib)`` declares the
    ctypes prototypes on first successful load."""

    def __init__(self, so_name: str,
                 setup: Callable[[ctypes.CDLL], None]) -> None:
        self._so_path = os.path.join(NATIVE_DIR, so_name)
        self._target = so_name
        self._setup = setup
        self._lock = threading.Lock()
        self._lib: Optional[ctypes.CDLL] = None
        self._tried = False

    def load(self) -> Optional[ctypes.CDLL]:
        with self._lock:
            if self._tried:
                return self._lib
            self._tried = True
            if not os.path.exists(self._so_path):
                try:
                    subprocess.run(
                        ["make", "-C", NATIVE_DIR, self._target],
                        check=True,
                        capture_output=True,
                        timeout=120,
                    )
                except Exception:
                    return None
            try:
                lib = ctypes.CDLL(self._so_path)
            except OSError:
                return None
            self._setup(lib)
            self._lib = lib
            return self._lib

    def available(self) -> bool:
        return self.load() is not None
