from .profiling import Timer, trace_annotation

__all__ = ["Timer", "trace_annotation"]
