"""Profiling hooks (the reference has none — SURVEY.md §5: only s/batch
logging). Thin wrappers over jax.profiler plus a step timer."""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling seconds-per-step, mirroring the reference's '%4.6fs/batch'
    logging (trainer_diffusion.py:195-200)."""

    def __init__(self):
        self._t0 = time.time()
        self._steps = 0

    def tick(self) -> None:
        self._steps += 1

    def rate_and_reset(self) -> float:
        t1 = time.time()
        rate = (t1 - self._t0) / max(self._steps, 1)
        self._t0 = t1
        self._steps = 0
        return rate
