"""Background-prefetching batch loader.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4)``
(Utils.py:49-55): a producer thread assembles batches (itself fanning image
decodes over a thread pool, datasets.py) while the consumer feeds the
device, so host IO overlaps accelerator compute."""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

_SENTINEL = object()


class Prefetcher:
    """Wraps a batch generator factory; each ``epoch()`` yields batches
    produced ``depth`` ahead on a daemon thread.  Exceptions in the producer
    re-raise in the consumer."""

    def __init__(self, epoch_fn: Callable[[], Iterator], depth: int = 3) -> None:
        self.epoch_fn = epoch_fn
        self.depth = depth

    def epoch(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err: list = []

        def produce():
            try:
                for batch in self.epoch_fn():
                    q.put(batch)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                err.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]
