"""Profiler tracing helpers.

The reference's observability is timestamped prints (SURVEY.md §5). Here:
a context manager around jax.profiler for on-demand device traces (viewable
in TensorBoard / Perfetto), plus annotation helpers that are no-ops when
tracing is off.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[str]:
    """Capture a jax.profiler trace for the enclosed block.

    Directory defaults to $NSD_TRACE_DIR or ./traces/<timestamp>.
    """
    import jax

    if log_dir is None:
        base = os.environ.get("NSD_TRACE_DIR", "traces")
        log_dir = os.path.join(base, time.strftime("%Y%m%dT%H%M%S"))
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context manager (shows up in profiler timelines)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
