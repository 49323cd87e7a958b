"""Profiling / observability (SURVEY.md §5: the reference has only tqdm).

  * trace(...)       — context manager around jax.profiler traces (view in
                       TensorBoard / xprof).
  * StepTimer        — block_until_ready-bracketed wall-clock timing with
                       warmup discard; reports p50/p90/mean.
  * ThroughputMeter  — edges/s, graphs/s accounting for the bench harness
                       and the trainer.
  * annotate         — jax.profiler.TraceAnnotation wrapper for named
                       regions inside steps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        holder = {}

        def block(x):
            holder["out"] = x
            return x

        yield block
        if "out" in holder:
            jax.block_until_ready(holder["out"])
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def record(self, seconds: float):
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(seconds)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        a = np.asarray(self.times)
        return {"steps": len(a), "mean_s": float(a.mean()),
                "p50_s": float(np.percentile(a, 50)),
                "p90_s": float(np.percentile(a, 90)),
                "total_s": float(a.sum())}


class ThroughputMeter:
    """Accumulates work counts against elapsed time."""

    def __init__(self):
        self.edges = 0
        self.graphs = 0
        self.steps = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def add(self, edges: int = 0, graphs: int = 0, steps: int = 1):
        if self._t0 is None:
            self.start()
        self.edges += edges
        self.graphs += graphs
        self.steps += steps

    def rates(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - (self._t0 or time.perf_counter()),
                 1e-9)
        return {"edges_per_s": self.edges / dt,
                "graphs_per_s": self.graphs / dt,
                "steps_per_s": self.steps / dt,
                "elapsed_s": dt}
