"""Hierarchical named timers, level-gated (reference
``blockcopy/blockcopy/utils/profiler.py:7-61``).

The reference fences with ``torch.cuda.synchronize``; the JAX equivalent is
``jax.block_until_ready`` on the default backend at span boundaries.  Spans
are only fenced when the profiler is enabled (level > 0), so the hot path
stays fully asynchronous by default.  For kernel-level detail use
``jax.profiler.trace`` (see ``utils.profiler.trace_to``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Timings:
    def __init__(self, level: int = 0):
        self.level = level
        self.reset()

    def set_level(self, level: int):
        self.level = level

    def reset(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.image_count = 0

    def add_count(self, n: int = 1):
        self.image_count += n

    @contextlib.contextmanager
    def env(self, name: str, level: int = 5):
        if self.level <= 0 or level > self.level:
            yield
            return
        self._sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sync()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    @staticmethod
    def _sync():
        # A device->host read is the only reliable fence on remote/relay
        # backends (block_until_ready can return before execution there).
        try:
            float(jax.device_put(0.0) + 0)
        except Exception:
            pass

    def __repr__(self):
        if not self.totals:
            return "Timings: (empty)"
        lines = ["Timings (avg ms/image):" if self.image_count else
                 "Timings (total s / count):"]
        for name in sorted(self.totals):
            tot, cnt = self.totals[name], self.counts[name]
            if self.image_count:
                lines.append(
                    f"  {name:<45s} {1000*tot/self.image_count:9.3f} ms/img "
                    f"({cnt} calls)"
                )
            else:
                lines.append(f"  {name:<45s} {tot:9.4f} s ({cnt} calls)")
        return "\n".join(lines)


timings = Timings()


@contextlib.contextmanager
def trace_to(logdir: str):
    """XLA-level profiling: writes a trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
