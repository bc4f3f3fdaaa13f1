"""Host-side input prefetching.

The reference overlaps batch assembly with compute via 4 torch DataLoader
worker processes (train_fibinet.py:49). Here batch assembly is cheap
(columnar slices + a device-side join), so a single background thread that
stays ``depth`` batches ahead — including the host->device transfer — is
enough to hide input latency behind the TPU step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(
    iterator: Iterator[T],
    transform: Callable[[T], T] | None = None,
    depth: int = 2,
) -> Iterator[T]:
    """Run ``iterator`` (and optional per-item ``transform``, e.g.
    device_put) in a daemon thread, keeping ``depth`` items ready."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(transform(item) if transform else item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
