"""Profiling helpers: per-step timing taxonomy + XLA trace capture.

Role-parity with the reference's profiling lane
(``profiling/profile_kernel.py`` cProfile drivers, per-step ``wall_time_s``
embedded in solver results ``fusion_kernel_newton_solver.py:613``,
controller ``timing_ms`` JSONL ``scpn/controller.py:397-409``, and the
metric taxonomy ``docs/PERFORMANCE_METRIC_TAXONOMY.md``).

JAX-native: ``time_fn`` measures warm wall time of any jitted callable
with completion blocking; ``trace`` context captures an XLA profiler trace
viewable in TensorBoard/Perfetto; ``StepTimer`` accumulates a named-metric
taxonomy and dumps JSONL.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Callable

import jax
import numpy as np


def time_fn(fn: Callable, *args, n_warmup: int = 2, n_repeats: int = 10,
            **kwargs) -> dict:
    """Warm wall-time stats of fn(*args, **kwargs) with output blocking."""
    out = fn(*args, **kwargs)
    for _ in range(n_warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    samples = np.empty(n_repeats)
    for i in range(n_repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        samples[i] = time.perf_counter() - t0
    return {
        "mean_s": float(samples.mean()),
        "p50_s": float(np.percentile(samples, 50)),
        "min_s": float(samples.min()),
        "max_s": float(samples.max()),
        "n": n_repeats,
    }


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/scpn_fusion_tpu_trace"):
    """Capture an XLA profiler trace around the with-block."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield Path(log_dir)
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named-metric wall-clock taxonomy (reference
    ``PERFORMANCE_METRIC_TAXONOMY.md`` shape: dotted metric names in us)."""

    def __init__(self):
        self._records: list[dict] = []

    @contextlib.contextmanager
    def measure(self, metric: str, **context):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._records.append({
                "metric": metric,
                "value_us": (time.perf_counter() - t0) * 1e6,
                "t": time.time(),
                **context,
            })

    def summary(self) -> dict:
        out: dict = {}
        for r in self._records:
            out.setdefault(r["metric"], []).append(r["value_us"])
        return {k: {"p50_us": float(np.percentile(v, 50)),
                    "mean_us": float(np.mean(v)), "n": len(v)}
                for k, v in out.items()}

    def dump_jsonl(self, path: str | Path) -> Path:
        p = Path(path)
        with open(p, "w", encoding="utf-8") as fh:
            for r in self._records:
                fh.write(json.dumps(r) + "\n")
        return p

    def reset(self) -> None:
        self._records.clear()
