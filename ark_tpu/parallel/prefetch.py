"""Async host prefetch: overlap TIFF/feather loading with device compute.

The reference's disk-centric dataflow loads each FOV synchronously between
compute steps; here a background thread pool keeps `buffer_size` FOV batches
decoded (and optionally already transferred to device) ahead of the consumer
(SURVEY.md §2.5(d): host↔device pipelining)."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax


class PrefetchLoader:
    """Iterate `load_fn(item)` results with background prefetching.

    Args:
        items: the work list (e.g. FOV names).
        load_fn: host loader (e.g. TIFF tree read -> np array).
        buffer_size: number of results to keep ready ahead of the consumer.
        device_put: if set, results are transferred to device with this
            sharding while the consumer computes on the previous batch.
    """

    def __init__(self, items: Iterable, load_fn: Callable,
                 buffer_size: int = 2, device_put=None):
        self.items = list(items)
        self.load_fn = load_fn
        self.buffer_size = max(buffer_size, 1)
        self.device_put = device_put

    def __len__(self):
        return len(self.items)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.buffer_size)
        sentinel = object()
        error_holder = []
        stop = threading.Event()

        def producer():
            try:
                for item in self.items:
                    if stop.is_set():
                        return
                    data = self.load_fn(item)
                    if self.device_put is not None:
                        data = jax.device_put(data, self.device_put)
                    # bounded put that notices consumer abandonment: a
                    # consumer that breaks out of the loop would otherwise
                    # leave this thread blocked forever on a full queue,
                    # pinning the decoded batch (and device buffers)
                    while not stop.is_set():
                        try:
                            q.put((item, data), timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except Exception as e:  # propagate to consumer
                error_holder.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                out = q.get()
                if out is sentinel:
                    if error_holder:
                        raise error_holder[0]
                    return
                yield out
        finally:
            # consumer done or abandoned (break / GeneratorExit): release
            # the producer and drop any buffered batches
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
