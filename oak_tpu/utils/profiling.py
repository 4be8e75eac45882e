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
    """Phase timer that truly waits for device work.

    Usage::

        timer = Timer()
        with timer("elbo_step", block_on=loss_holder):
            loss_holder.append(step(...))   # async dispatch
        timer.results  # {"elbo_step": 0.123}

    Synchronization is by VALUE FETCH (``jax.device_get``), not
    ``block_until_ready``: through this environment's TPU socket relay,
    block_until_ready can return seconds before the device drains (see
    BASELINE.md "Relay dispatch note"), silently under-reporting. Pass a
    SMALL array (a scalar loss) as ``block_on`` — fetching large results
    would time the relay's ~11 MB/s link instead of the device.
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
                jax.device_get(jax.tree_util.tree_leaves(block_on)[-1])
            else:
                # flushes dispatch-side effects; NOT a device fence through
                # the relay — prefer passing block_on
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
