"""Tracing / profiling utilities.

The reference's observability is ``time.time()`` around the eval loop and loss
prints (``evaluate.py:81,125-126``, ``train.py:149``).  Here: hierarchical phase
timers with device synchronization, per-step throughput meters, and an optional
``jax.profiler`` trace context for TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PhaseTimer:
    """Accumulating named phase timer.  ``sync=True`` blocks on device work so
    a phase's time includes its async dispatches."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None and self.sync:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:32s} {t:9.3f}s total  {t / max(c, 1) * 1e3:9.2f} ms/call  x{c}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            n: {"total_s": self.totals[n], "calls": self.counts[n]} for n in self.totals
        }

    def dump_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.as_dict(), f, indent=2)


class ThroughputMeter:
    """EMA-smoothed items/sec meter for train/inference loops."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.rate: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, items: int) -> float:
        now = time.perf_counter()
        if self._last is not None:
            inst = items / max(now - self._last, 1e-9)
            self.rate = inst if self.rate is None else (
                (1 - self.alpha) * self.rate + self.alpha * inst
            )
        self._last = now
        return self.rate or 0.0


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when ``log_dir`` is None (or the
    platform can't trace, e.g. tunneled backends)."""
    if not log_dir:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
