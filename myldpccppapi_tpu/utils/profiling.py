"""Tracing, phase timing, and metric emission.

What the reference sketches but never finishes — ``stepTime[10]`` phase
counters that are filled and never printed (``MyLdpc.h:133``,
``MyLdpc.cpp:990-1056``) and ad-hoc ``clock()`` deltas in the CLI — done
properly: named phase timers, ``jax.profiler`` trace capture around decode
hot loops, iterations-to-convergence histograms, and structured JSON metric
emission for the benchmark harness (SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import numpy as np

__all__ = ["PhaseTimer", "trace", "iterations_histogram", "emit_metrics"]


class PhaseTimer:
    """Accumulating named wall-clock phase timers.

    >>> t = PhaseTimer()
    >>> with t.phase("h2d"): ...
    >>> with t.phase("decode"): ...
    >>> t.report()   # {'h2d': {'total_s': ..., 'calls': ...}, ...}
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "calls": self.calls[k],
                "mean_s": self.totals[k] / max(self.calls[k], 1),
            }
            for k in sorted(self.totals)
        }

    def reset(self) -> None:
        self.totals.clear()
        self.calls.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a ``jax.profiler`` device trace into ``log_dir`` (viewable in
    XProf/TensorBoard); a no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def iterations_histogram(iterations, max_iters: int) -> Dict[str, object]:
    """Iterations-to-convergence distribution as a first-class metric."""
    it = np.asarray(iterations).reshape(-1)
    counts = np.bincount(it, minlength=max_iters + 1)
    return {
        "mean": float(it.mean()) if it.size else float("nan"),
        "p50": float(np.percentile(it, 50)) if it.size else float("nan"),
        "p99": float(np.percentile(it, 99)) if it.size else float("nan"),
        "max": int(it.max()) if it.size else 0,
        "at_cap": int(counts[max_iters]) if max_iters < len(counts) else 0,
        "counts": counts.tolist(),
    }


def emit_metrics(path: Optional[str], **metrics) -> str:
    """Serialize metrics to one JSON object (written to ``path`` if given)."""
    s = json.dumps(metrics, sort_keys=True, default=float)
    if path:
        with open(path, "w") as f:
            f.write(s + "\n")
    return s
