"""Per-stage timing + counters: the observability module.

Replaces the reference's compile-time SAVE_TIMES CSV emitters and ad-hoc
chrono brackets (reference: include/System.h:24, src/Tracking.cc:1246-1254,
src/LocalMapping.cc:300-480) with an always-on, cheap stage profiler the
pipeline can query/export at any time.  For device-level traces use
jax.profiler.trace() around a run and inspect with xprof/tensorboard.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict


class Metrics:
    def __init__(self):
        self.times = defaultdict(float)
        self.counts = defaultdict(int)
        self.values = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, value: float) -> None:
        self.values[name].append(float(value))

    def bump(self, name: str, n: int = 1) -> None:
        self.counts[name] += n

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, total in self.times.items():
            n = max(self.counts[name], 1)
            out[name] = {"total_s": round(total, 4),
                         "mean_ms": round(total / n * 1e3, 3),
                         "calls": self.counts[name]}
        for name, vals in self.values.items():
            if vals:
                import numpy as np
                out[name] = {"mean": float(np.mean(vals)),
                             "last": vals[-1], "n": len(vals)}
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)


GLOBAL = Metrics()
