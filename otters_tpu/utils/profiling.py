"""Profiling integration.

The reference's observability contract is host wall-clock phase timers
surfaced in stats tables (SURVEY.md §5); otters-tpu keeps those
(``MetaBuildStats`` / ``MetaQueryStats``) and adds optional device-level
tracing through ``jax.profiler`` for use with XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace of the enclosed queries.

    >>> with otters_tpu.utils.trace("/tmp/otters-trace"):
    ...     store.query(q, Metric.Cosine).take(10).collect()

    View with TensorBoard's profile plugin or XProf.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
