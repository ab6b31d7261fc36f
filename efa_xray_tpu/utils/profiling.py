"""Profiling hooks.

The reference has no tracing at all (SURVEY.md §5.1 — just verbose
prints).  Here the filter phases carry ``jax.named_scope`` annotations (see
:mod:`efa_xray_tpu.assimilation.ensrf_core`) so device traces attribute
time to ``ensrf/tail_scan``, ``ensrf/block_update`` etc., and this module
provides the capture entry points.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto:

    >>> with profiling.trace("/tmp/ensrf-trace"):
    ...     filt.update()
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """``jax.named_scope`` passthrough for annotating user code phases."""
    import jax

    return jax.named_scope(name)
