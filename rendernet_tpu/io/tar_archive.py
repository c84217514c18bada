"""Streaming TAR dataset archives.

TAR files are the training-data container: each entry is a zlib-compressed
``.npy``, a ``.binvox``, or an encoded image. Mirrors the capabilities of the
reference ``tools/utils.py:24-109`` (``NpyTarWriter``/``NpyTarReader``) —
entry naming, per-entry zlib compression, extension dispatch, and the
filename->model-name pairing rules — with a fresh implementation.
"""
from __future__ import annotations

import io
import tarfile
import time
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np

from rendernet_tpu.io import binvox as binvox_rw
from rendernet_tpu.utils.image import decode_image

PREFIX = "data/"
SUFFIX = ".npy.z"

__all__ = ["NpyTarWriter", "NpyTarReader", "derive_model_name"]


class NpyTarWriter:
    """Write numpy arrays into a tar stream as zlib-compressed .npy entries."""

    def __init__(self, fname: str):
        self.tfile = tarfile.open(fname, "w|")

    def add(self, arr: np.ndarray, name: str) -> None:
        sio = io.BytesIO()
        np.save(sio, arr)
        zbuf = zlib.compress(sio.getvalue())
        tinfo = tarfile.TarInfo(f"{PREFIX}{name}{SUFFIX}")
        tinfo.size = len(zbuf)
        tinfo.mtime = int(time.time())
        self.tfile.addfile(tinfo, io.BytesIO(zbuf))

    def close(self) -> None:
        self.tfile.close()

    def __enter__(self) -> "NpyTarWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def derive_model_name(entry_name: str) -> str:
    """Recover the paired binvox model name from an image entry name.

    Reference naming convention (``tools/utils.py:81-96``): ShapeNet image
    entries are ``model_<cls>_<idx>_..._p{az}_t{el}_r{radius}``; the binvox
    pair is ``<p0>_<p1>_<p2>_clean.binvox``. Basel-face entries start with
    ``ply<id>`` and pair with ``ply<id>.binvox``.
    """
    parts = entry_name.split("_")
    if "ply" in parts[0]:
        return parts[0]
    return "_".join(parts[:3]) + "_clean"


class NpyTarReader:
    """Iterate (array, name) pairs out of a dataset tar stream.

    Dispatch by extension:
      * ``*.npy.z`` / ``*.npy`` -> decompressed numpy array (no name).
      * ``*.binvox``            -> (dense bool array, derived model name).
      * ``*.png`` / ``*.jpg``   -> (float32 HWC image, entry stem).
    Undecodable images yield ``(None, None)`` so callers can skip them.
    """

    def __init__(self, fname: str):
        self.tfile = tarfile.open(fname, "r|*")

    def __iter__(self) -> Iterator[Tuple[Optional[np.ndarray], Optional[str]]]:
        return self

    def __next__(self):
        while True:
            entry = self.tfile.next()
            if entry is None:
                self.close()
                raise StopIteration()
            if not entry.isfile():
                continue
            fileobj = self.tfile.extractfile(entry)
            if fileobj is None:
                continue
            contents = fileobj.read()
            return self._decode(entry.name, contents)

    next = __next__

    def _decode(self, name: str, contents: bytes):
        components = name.split(".")
        if components[-1].lower() == "z":
            contents = zlib.decompress(contents)
            components.pop()
        ext = components[-1].lower()
        # Strip only the trailing extension(s): pose fields like "r3.3"
        # contain dots, so never split on the first dot (the reference strips
        # a fixed-width suffix, tools/utils.py:91).
        stem = name.rsplit("/", 1)[-1]
        if stem.lower().endswith(".z"):
            stem = stem[:-2]
        if stem.lower().endswith("." + ext):
            stem = stem[: -(len(ext) + 1)]

        if ext == "npy":
            return np.load(io.BytesIO(contents)), stem
        if ext == "binvox":
            vox = binvox_rw.read_as_3d_array(io.BytesIO(contents))
            return vox.data, derive_model_name(stem)
        if ext in ("jpg", "jpeg", "png"):
            try:
                image = decode_image(contents).astype(np.float32)
            except Exception:
                return None, None
            return image, stem
        return None, None

    def close(self) -> None:
        # Idempotent and safe under generator teardown: when a consumer
        # abandons a loader generator mid-iteration, GC runs this close
        # while the interpreter may already have torn parts of the tarfile
        # down (observed: AttributeError on a half-closed member stream).
        try:
            self.tfile.close()
        except (OSError, AttributeError):
            pass

    def __enter__(self) -> "NpyTarReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
