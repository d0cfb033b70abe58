"""Tracing / observability.

The reference's only instrumentation is a wall-clock ``time taken: {}μs``
print behind the ``-d`` flag (``encode.zig:26-28``, ``decode.zig:15-17``).
Here every pipeline phase can emit a structured timing line, and full XLA
traces are one env var away:

* ``ENTREEPY_TRACE=1``       — per-phase stderr lines
  ``[entreepy-tpu] phase=<name> ms=<t> [MBps=<rate>]``
* ``ENTREEPY_PROFILE=<dir>`` — wrap the process in a ``jax.profiler`` trace
  written to <dir> (view with TensorBoard / xprof), via :func:`maybe_profile`.

Overhead is a single ``os.environ`` check when disabled.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_ENABLED = os.environ.get("ENTREEPY_TRACE", "") not in ("", "0")


def enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def phase(name: str, nbytes: int | None = None):
    """Time a pipeline phase; emits a structured line when tracing is on."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        rate = f" MBps={nbytes / dt / 1e6:.1f}" if nbytes and dt > 0 else ""
        print(f"[entreepy-tpu] phase={name} ms={dt * 1e3:.2f}{rate}", file=sys.stderr)


@contextlib.contextmanager
def maybe_profile():
    """jax.profiler trace around the block when ENTREEPY_PROFILE=<dir> is set."""
    out = os.environ.get("ENTREEPY_PROFILE")
    if not out:
        yield
        return
    import jax

    jax.profiler.start_trace(out)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
