"""Per-stage timing series (reference SURVEY.md §5 'Tracing/profiling').

The reference keeps always-on per-stage wall-time vectors
(``Tracking::mvdTrack_ms``, LocalMapping KF-processing + mutex-wait,
LoopClosing PR/LC/MM phases) exported by SaveTimes.  This is the same
machinery: named series of milliseconds with context-manager recording,
exported in the ``Times*.txt`` schema by io/writers.save_time_series.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List


class Timers:
    def __init__(self):
        self.series: Dict[str, List[float]] = defaultdict(list)

    @contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.series[name].append((time.perf_counter() - t0) * 1e3)

    def add(self, name: str, ms: float):
        self.series[name].append(ms)

    def summary(self) -> Dict[str, tuple]:
        out = {}
        for k, v in self.series.items():
            if v:
                import numpy as np

                a = np.asarray(v)
                out[k] = (len(a), float(a.mean()), float(np.median(a)),
                          float(a.max()))
        return out
