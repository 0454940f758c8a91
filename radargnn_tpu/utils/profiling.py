"""Observability: step timing, edges/s counters, jax.profiler trace hooks.

The reference has no tracing/profiling beyond wall-clock prints (SURVEY.md
§5). This module provides the north-star metrics plumbing: per-step timers
with edges/s (the headline throughput unit), rolling statistics, and a
context manager around `jax.profiler` for on-demand TPU traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class StepStats:
    step_times_s: List[float] = field(default_factory=list)
    edges_per_step: List[int] = field(default_factory=list)

    def record(self, dt: float, num_edges: int) -> None:
        self.step_times_s.append(dt)
        self.edges_per_step.append(num_edges)

    @property
    def total_edges(self) -> int:
        return sum(self.edges_per_step)

    @property
    def total_time(self) -> float:
        return sum(self.step_times_s)

    def edges_per_s(self, skip_first: int = 1) -> float:
        """Throughput excluding warmup/compile steps."""
        times = self.step_times_s[skip_first:]
        edges = self.edges_per_step[skip_first:]
        return sum(edges) / sum(times) if times and sum(times) > 0 else 0.0

    def mean_step_ms(self, skip_first: int = 1) -> float:
        times = self.step_times_s[skip_first:]
        return 1000.0 * sum(times) / len(times) if times else 0.0

    def summary(self) -> dict:
        return {
            "steps": len(self.step_times_s),
            "mean_step_ms": round(self.mean_step_ms(), 3),
            "edges_per_s": round(self.edges_per_s(), 1),
            "total_edges": self.total_edges,
        }


class StepTimer:
    """Times device steps (the caller must block on results before exit)."""

    def __init__(self, stats: Optional[StepStats] = None):
        self.stats = stats or StepStats()
        self._t0 = None

    @contextlib.contextmanager
    def step(self, num_edges: int):
        t0 = time.perf_counter()
        yield
        self.stats.record(time.perf_counter() - t0, num_edges)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block: `with trace('/tmp/tb'): step()`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def write_metrics_jsonl(path: str, metric: str, value: float, unit: str,
                        **extra) -> None:
    """Appends one JSON line of metrics (driver/bench compatible format)."""
    record = {"metric": metric, "value": value, "unit": unit, **extra}
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
