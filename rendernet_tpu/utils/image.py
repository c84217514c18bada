"""Host-side image encode/decode/save helpers (PIL-backed)."""
from __future__ import annotations

import io
from typing import Optional

import numpy as np

try:
    from PIL import Image

    _HAVE_PIL = True
except ImportError:  # pragma: no cover - PIL is in the base image
    _HAVE_PIL = False

__all__ = ["decode_image", "encode_png", "save_image", "save_gif", "to_uint8"]


def _require_pil():
    if not _HAVE_PIL:
        raise RuntimeError("PIL is required for image decode/encode")


def decode_image(buf: bytes) -> np.ndarray:
    """Decode an encoded image byte string to an HW or HWC uint8 array.

    PNGs take the native C++ fast path (native/imgio.cc — releases the
    GIL, so prefetch threads decode in parallel); anything outside its
    envelope falls back to PIL."""
    from rendernet_tpu.io import native_img

    decoded = native_img.decode_png(buf)
    if decoded is not None:
        return decoded
    _require_pil()
    with Image.open(io.BytesIO(buf)) as im:
        return np.asarray(im)


def to_uint8(img: np.ndarray, scale: Optional[float] = None) -> np.ndarray:
    """Clip to [0, 255] uint8; ``scale`` multiplies first (e.g. 255 for [0,1])."""
    img = np.asarray(img)
    if scale is not None:
        img = img * scale
    return np.clip(img, 0, 255).astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """Encode an HW/HWC uint8 (or [0,1] float) array as PNG bytes."""
    _require_pil()
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr, scale=255.0 if arr.max() <= 1.5 else None)
    arr = np.squeeze(arr)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def save_image(img: np.ndarray, path: str) -> None:
    """Save an array as an image file; floats in [0,1] are rescaled."""
    with open(path, "wb") as f:
        f.write(encode_png(img))


def save_gif(frames, path: str, fps: float = 12.0) -> None:
    """Save a sequence of HW/HWC frames as an animated GIF (the reference
    README's result format)."""
    _require_pil()
    imgs = []
    for frame in frames:
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = to_uint8(arr, scale=255.0 if arr.max() <= 1.5 else None)
        imgs.append(Image.fromarray(np.squeeze(arr)))
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
