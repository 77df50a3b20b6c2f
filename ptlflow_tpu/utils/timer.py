"""Tic/toc accumulating timer (reference: ptlflow/utils/timer.py:29-234)."""

from __future__ import annotations

import time
from typing import Dict, List, Optional


class Timer:
    def __init__(self, name: str = "timer"):
        self.name = name
        self.reset()

    def reset(self):
        self._start: Optional[float] = None
        self._samples: List[float] = []

    def tic(self):
        self._start = time.perf_counter()

    def toc(self) -> float:
        assert self._start is not None, "toc() without tic()"
        dt = time.perf_counter() - self._start
        self._samples.append(dt)
        self._start = None
        return dt

    def __enter__(self):
        self.tic()
        return self

    def __exit__(self, *exc):
        self.toc()

    @property
    def count(self) -> int:
        return len(self._samples)

    def total(self) -> float:
        return sum(self._samples)

    def mean(self) -> float:
        return self.total() / max(self.count, 1)

    def median(self) -> float:
        if not self._samples:
            return 0.0
        s = sorted(self._samples)
        return s[len(s) // 2]

    def percentile(self, pct: float) -> float:
        if not self._samples:
            return 0.0
        s = sorted(self._samples)
        idx = min(int(len(s) * pct / 100.0), len(s) - 1)
        return s[idx]


class TimerManager:
    """Named timer registry: ``with timers("fnet"): ...``."""

    def __init__(self):
        self.timers: Dict[str, Timer] = {}

    def __call__(self, name: str) -> Timer:
        if name not in self.timers:
            self.timers[name] = Timer(name)
        return self.timers[name]

    def summary(self) -> str:
        lines = []
        for name, t in self.timers.items():
            lines.append(f"{name}: n={t.count} mean={t.mean() * 1000:.2f}ms "
                         f"median={t.median() * 1000:.2f}ms")
        return "\n".join(lines)
