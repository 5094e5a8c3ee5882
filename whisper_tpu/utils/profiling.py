"""Profiling helpers (SURVEY.md §5 tracing): jax.profiler trace contexts and
named scopes around the hot phases (frontend / encoder / decode step), viewable
in xprof/TensorBoard. The reference has no tracing at all."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into log_dir (no-op if log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Annotate a region so it shows up named in the trace viewer."""
    return jax.named_scope(name)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Host-side trace annotation (shows in the TraceMe timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield
