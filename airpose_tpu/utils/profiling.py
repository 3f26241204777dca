"""Profiling & step-timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5); this module
makes it first-class: jax.profiler trace capture around training windows and
a step timer whose synchronization works on backends where
block_until_ready is unreliable (the timed region ends with a device→host
transfer — see .claude/skills/verify/SKILL.md for the backend quirk).
"""

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> float:
    """Force completion of a pytree's computation via a scalar host
    transfer; returns the transferred value (backend-safe barrier)."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    return float(jnp.asarray(leaves[0]).ravel()[0])


class StepTimer:
    """Rolling step-time statistics with proper device synchronization."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if outputs is not None:
            sync(outputs)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / arr.mean()),
        }
