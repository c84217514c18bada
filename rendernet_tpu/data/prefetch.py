"""Background chunk prefetching for the host input pipeline.

The reference's data generators are synchronous (tools/data_util.py:64:
the GPU idles while the next chunk's PNGs/binvoxes decode). On TPU the
step time is a few hundred ms while a chunk decode is seconds of host
work — unoverlapped, that's a large fraction of wall-clock. ``prefetch``
runs any chunk generator in a daemon thread with a bounded queue so
decode overlaps device compute; the training loops wrap their loaders
with it (``TrainConfig.prefetch_chunks``).

Safe with our loaders because each ``yield`` hands off freshly allocated
arrays (loaders re-allocate after yielding rather than reusing buffers).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

__all__ = ["prefetch"]

_DONE = object()


class _Prefetcher(Iterator[T]):
    def __init__(self, it: Iterable[T], depth: int):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._closed = threading.Event()
        self._err: BaseException | None = None
        self._thread = threading.Thread(
            target=self._produce, args=(iter(it),), daemon=True
        )
        self._thread.start()

    def _produce(self, it: Iterator[T]) -> None:
        try:
            for item in it:
                while not self._closed.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._closed.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            self._err = e
        while not self._closed.is_set():
            try:
                self._q.put(_DONE, timeout=0.1)
                return
            except queue.Full:
                continue

    def __iter__(self) -> "_Prefetcher[T]":
        return self

    def __next__(self) -> T:
        if self._closed.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _DONE:
            self._closed.set()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Stop the producer; safe after an early ``break``."""
        self._closed.set()

    def __del__(self):  # best-effort cleanup on abandonment
        self._closed.set()


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``it`` on a background thread, keeping up to ``depth``
    items decoded ahead of the consumer. ``depth <= 0`` returns ``it``
    unchanged (synchronous reference behavior)."""
    if depth <= 0:
        return iter(it)
    return _Prefetcher(it, depth)
