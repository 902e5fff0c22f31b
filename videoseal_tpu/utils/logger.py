"""Metric logging (parity: videoseal/utils/logger.py MetricLogger/SmoothedValue).

Windowed median/avg per metric + global averages; `sync()` all-reduces
global sums across hosts with jax collectives (logger.py:149-161 analog).
"""

from __future__ import annotations

import collections
import statistics
import time


class SmoothedValue:
    def __init__(self, window: int = 20):
        self.window = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, v: float, n: int = 1):
        self.window.append(v)
        self.total += v * n
        self.count += n

    @property
    def median(self):
        return statistics.median(self.window) if self.window else 0.0

    @property
    def avg(self):
        return sum(self.window) / len(self.window) if self.window else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self._t0 = time.time()

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def averages(self) -> dict:
        return {k: m.global_avg for k, m in self.meters.items()}

    def recent(self) -> dict:
        """Windowed medians — the trajectory signal (global_avg flattens
        any learning trend into the lifetime mean)."""
        return {k: m.median for k, m in self.meters.items()}

    def line(self, prefix: str = "", keys=None) -> str:
        keys = keys or list(self.meters)
        parts = [prefix] if prefix else []
        for k in keys:
            m = self.meters[k]
            parts.append(f"{k}: {m.median:.4f} ({m.global_avg:.4f})")
        return self.delimiter.join(parts)

    def sync(self):
        """All-reduce global sums across hosts (multi-host runs)."""
        import jax
        if jax.process_count() == 1:
            return
        import numpy as np
        from jax.experimental import multihost_utils
        keys = sorted(self.meters)
        vals = np.asarray([[self.meters[k].total, self.meters[k].count]
                           for k in keys], np.float64)
        summed = multihost_utils.process_allgather(vals).sum(axis=0)
        for i, k in enumerate(keys):
            self.meters[k].total = float(summed[i, 0])
            self.meters[k].count = int(summed[i, 1])
