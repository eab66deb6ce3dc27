"""Background prefetch loader.

Replaces the reference's torch ``DataLoader(num_workers=6)``
(``test_swiftnet.py:70-80``): a thread pool decodes/transforms upcoming clips
while the TPU steps the current one, hiding PIL decode latency behind device
compute.  (For the native C++ decode path see ``blockcopy_tpu/native``.)
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator


class PrefetchLoader:
    def __init__(self, dataset, num_workers: int = 6, prefetch: int = 4,
                 max_items: int = -1):
        self.dataset = dataset
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        n = len(dataset)
        self.count = n if max_items < 0 else min(n, max_items)

    def __len__(self):
        return self.count

    def __iter__(self) -> Iterator:
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def submit_all():
            futures = [pool.submit(self.dataset.__getitem__, i)
                       for i in range(self.count)]
            for f in futures:
                if stop.is_set():
                    break
                q.put(f)
            q.put(None)

        feeder = threading.Thread(target=submit_all, daemon=True)
        feeder.start()
        try:
            while True:
                f = q.get()
                if f is None:
                    break
                yield f.result()
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)
