"""Cross-cutting utilities: logging, security helpers, profiling."""
