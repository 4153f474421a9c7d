"""Profiling hooks (SURVEY.md §5.1: block_until_ready timing + optional
jax.profiler traces).

``trace(dir)`` wraps a region in a jax profiler trace (viewable with
TensorBoard's profile plugin or Perfetto); no-op if tracing is unavailable on
the current backend.
"""

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Context manager: capture a device trace of the enclosed region."""
    if not log_dir:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # some backends (remote relays) can't trace
        print(f"[profiler] trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


def annotate(name):
    """Named sub-region inside a trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
