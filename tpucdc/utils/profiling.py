"""Tracing/profiling hooks (SURVEY.md §5.1).

``profile_trace`` wraps jax.profiler.trace around a region (Perfetto/XProf
traces of the DDIM scan or train step, via the pipelines' --profile flag);
``timed_block`` is the block_until_ready latency harness behind the
BASELINE.json:2 latency and steps/sec numbers."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace when logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


@contextlib.contextmanager
def timed_block(sink: dict, key: str):
    """Wall-time a region, blocking on all outstanding device work at exit."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        try:
            jax.block_until_ready(jax.device_put(0))
        except Exception:
            pass
        sink[key] = time.perf_counter() - t0
