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
    device_put) in a daemon thread, keeping ``depth`` items ready.

    Shutdown-safe: if the consumer abandons the generator early (exception
    in the train step, KeyboardInterrupt, break), closing it signals the
    worker to stop — without this the worker would block forever in
    ``q.put`` holding ``depth+1`` device-resident batches in HBM."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                out = transform(item) if transform else item
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        # unblock a pending put and release its batch reference
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
