from .diagnostics import assert_finite, cholesky_health, finite_or_debug
from .profiling import Timer, profile, trace_annotation

__all__ = ["Timer", "trace_annotation", "profile",
           "assert_finite", "cholesky_health", "finite_or_debug"]
