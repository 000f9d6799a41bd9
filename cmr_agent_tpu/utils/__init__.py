"""Utilities: profiling/tracing, timing, reproducibility."""

from .profiling import PhaseTimer, trace_context, device_sync  # noqa: F401
