"""Profiling / tracing utilities.

The reference's only observability is wall-clock prints around optimization
(model_utils.py:169-175,427). TPU-native equivalent: per-phase timers that
block on device completion, plus jax.profiler trace annotations that show up
in TensorBoard/Perfetto traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Timer:
    """Phase timer that blocks until device work completes.

    Usage::

        timer = Timer()
        with timer("elbo_step"):
            loss = step(...)          # async dispatch
        timer.results  # {"elbo_step": 0.123}
    """

    def __init__(self):
        self.results: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            else:
                # ensure all dispatched work is done
                jax.effects_barrier()
            self.results[name] = self.results.get(name, 0.0) + (
                time.perf_counter() - t0
            )


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in jax.profiler traces (no-op overhead when not tracing)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile(log_dir: Optional[str] = None):
    """Capture a full device trace into ``log_dir`` for TensorBoard/Perfetto."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
