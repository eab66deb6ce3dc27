"""PrefetchLoader: ordering, bounded in-flight decode (backpressure), and
early-stop cleanup."""

import threading
import time

from blockcopy_tpu.data.loader import PrefetchLoader


class InstrumentedDataset:
    """Counts items currently decoded-or-decoding ("live")."""

    def __init__(self, n, delay=0.0):
        self.n = n
        self.delay = delay
        self.live = 0
        self.max_live = 0
        self.lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self.lock:
            self.live += 1
            self.max_live = max(self.max_live, self.live)
        if self.delay:
            time.sleep(self.delay)
        return i

    def consumed(self, k):
        # consumer releases an item (decode finished long ago)
        with self.lock:
            self.live -= 1


def test_order_and_completeness():
    ds = InstrumentedDataset(17)
    out = list(PrefetchLoader(ds, num_workers=3, prefetch=2))
    assert out == list(range(17))


def test_slow_consumer_bounded_in_flight():
    """A consumer much slower than decode must not accumulate unbounded
    decoded items: at most prefetch+1 are ever live at once."""
    ds = InstrumentedDataset(24, delay=0.002)
    loader = PrefetchLoader(ds, num_workers=4, prefetch=3)
    seen = []
    for item in loader:
        time.sleep(0.02)  # 10x slower than decode
        ds.consumed(item)
        seen.append(item)
    assert seen == list(range(24))
    # +1: the item currently held by the consumer (yielded, not yet released)
    assert ds.max_live <= loader.max_in_flight() + 1, (
        ds.max_live, loader.max_in_flight())


def test_fast_consumer_unchanged():
    ds = InstrumentedDataset(12, delay=0.01)
    out = list(PrefetchLoader(ds, num_workers=4, prefetch=4))
    assert out == list(range(12))


def test_early_break_stops_feeder():
    ds = InstrumentedDataset(1000, delay=0.001)
    loader = PrefetchLoader(ds, num_workers=2, prefetch=2)
    consumed = 0
    for item in loader:
        consumed += 1
        if item >= 3:
            break
    time.sleep(0.1)  # let any stragglers run
    # ``live`` is never decremented here, so it counts decodes ever started;
    # the feeder must not have raced ahead of consumption + the pipeline bound
    assert ds.live <= consumed + loader.max_in_flight(), (
        ds.live, consumed, loader.max_in_flight())


def test_max_items_truncates():
    ds = InstrumentedDataset(30)
    loader = PrefetchLoader(ds, num_workers=2, prefetch=2, max_items=5)
    assert len(loader) == 5
    assert list(loader) == list(range(5))
