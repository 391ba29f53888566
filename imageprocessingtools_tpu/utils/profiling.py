"""jax.profiler integration (survey §5: tracing subsystem).

Usage:
    with trace_to("/tmp/ipt-trace"):
        fused_gray_gauss_histeq(img).block_until_ready()
then load the trace directory in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device trace around the with-block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for traces: use as a context manager or decorator."""
    return jax.profiler.TraceAnnotation(name)
