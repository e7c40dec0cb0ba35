"""Tracing / profiling hooks.

The reference has no profiling story beyond wall-clock prints
(SURVEY.md section 5).  This module provides:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace (XLA ops, fusion, HBM traffic),
* :class:`PhaseTimer` — lightweight named wall-clock phases with device
  synchronization, for the eval/demo harnesses,
* :func:`device_memory_stats` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate wall-clock per named phase; ``block=True`` syncs the
    device so asynchronous dispatch doesn't hide compute in later phases."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block: bool = True):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block:
                try:
                    (jax.device_put(0.0) + 0).block_until_ready()
                except Exception:
                    pass
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> str:
        rows = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            rows.append(f"{name:<24} total {t:8.3f}s  n {c:5d}  avg {t / c:8.4f}s")
        return "\n".join(rows)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats() or {}
        except Exception:
            out[str(d)] = {}
    return out
