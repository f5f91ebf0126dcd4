"""Cross-cutting utilities: tracing, timing, profiling."""

from a_nice_rag_tpu.utils.trace import QueryTrace, TraceRun  # noqa: F401
