"""Tracing & throughput counters.

The reference has no profiling at all (SURVEY.md §5: progress = tqdm bars);
here tracing is first-class: ``trace`` wraps ``jax.profiler`` so any region
(train steps, eval sweep) can be captured for TensorBoard/XProf, and
``StepTimer`` gives streaming step-time / examples-per-second stats with a
hard host sync so numbers are honest on tunneled TPU platforms where
``block_until_ready`` may return early.
"""

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str], enabled: bool = True):
    """Capture a jax.profiler trace of the enclosed region into ``log_dir``
    (no-op when disabled or log_dir is None)."""
    if not enabled or log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def hard_sync(x) -> None:
    """Force device->host completion of ``x`` (device_get, not
    block_until_ready — see module docstring)."""
    import jax
    jax.device_get(x)


class StepTimer:
    """Streaming step-time statistics.

    >>> timer = StepTimer(batch_size=256)
    >>> for batch in batches:
    ...     with timer.step():
    ...         state, logs = train_step(state, batch)
    >>> timer.summary()   # {'steps', 'mean_step_ms', 'p50', 'p99', 'examples_per_second'}
    """

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.durations = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.durations.append(time.perf_counter() - t0)

    def record(self, seconds: float) -> None:
        self.durations.append(seconds)

    def summary(self, skip_warmup: int = 1) -> dict:
        d = np.asarray(self.durations[skip_warmup:] or self.durations)
        if d.size == 0:
            return {"steps": 0}
        return {
            "steps": int(d.size),
            "mean_step_ms": float(d.mean() * 1e3),
            "p50_step_ms": float(np.percentile(d, 50) * 1e3),
            "p99_step_ms": float(np.percentile(d, 99) * 1e3),
            "examples_per_second": float(self.batch_size / d.mean()),
        }

    def reset(self) -> None:
        self.durations = []
