"""Background-thread data prefetching.

The reference relies on torch DataLoader workers (num_threads,
options.py:32); this is the framework's host-side equivalent: a small
thread pool prepares upcoming dataset items / collated batches while the
device runs the current step, overlapping host IO + sampling with TPU
compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


class Prefetcher:
    """Wrap an index-able dataset + collate into a prefetching iterator."""

    def __init__(self, fetch: Callable[[int], object], indices: Iterable[int],
                 num_threads: int = 2, buffer: int = 4):
        self.fetch = fetch
        self.indices = list(indices)
        self.buffer = max(buffer, 1)
        self.num_threads = max(min(num_threads, len(self.indices)), 1)

    def __len__(self) -> int:
        return len(self.indices)

    def __iter__(self) -> Iterator:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.buffer)
        idx_q: "queue.Queue" = queue.Queue()
        for pos, i in enumerate(self.indices):
            idx_q.put((pos, i))

        results: dict[int, object] = {}
        lock = threading.Lock()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    pos, i = idx_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    item = self.fetch(i)
                except Exception as e:  # surface errors to the consumer
                    item = e
                with lock:
                    results[pos] = item

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()

        try:
            for pos in range(len(self.indices)):
                while True:
                    with lock:
                        if pos in results:
                            item = results.pop(pos)
                            break
                    threading.Event().wait(0.002)
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_batches(dataset, batch_size: int, collate: Callable,
                     order, num_threads: int = 2):
    """Prefetching equivalent of train.loop._batches."""
    starts = range(0, len(order) - batch_size + 1, batch_size)

    def fetch(s):
        return collate([dataset[int(i)] for i in order[s:s + batch_size]])

    return Prefetcher(fetch, starts, num_threads=num_threads)
