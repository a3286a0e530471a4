"""Profiling & tracing utilities.

Supersedes the reference's wall-time-only scope profiler
(`main/diffusion/logger.py:294-322`, `profile_kv` / `@profile`): the same
API, plus `jax.profiler` trace capture (xprof-compatible) and named
`TraceAnnotation` scopes that show up on the TPU timeline.
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

_PROFILE_SUMS: Dict[str, float] = defaultdict(float)
_PROFILE_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def profile_kv(scopename: str, device_annotation: bool = True):
    """Wall-time scope accounting (+ device trace annotation under capture)."""
    t0 = time.perf_counter()
    ctx = (
        jax.profiler.TraceAnnotation(scopename)
        if device_annotation
        else contextlib.nullcontext()
    )
    try:
        with ctx:
            yield
    finally:
        _PROFILE_SUMS[scopename] += time.perf_counter() - t0
        _PROFILE_COUNTS[scopename] += 1


def profile(fn=None, *, name: Optional[str] = None):
    """Decorator version (ref `logger.py:314-322`)."""

    def deco(f):
        scope = name or f.__name__

        @functools.wraps(f)
        def wrapped(*a, **k):
            with profile_kv(scope):
                return f(*a, **k)

        return wrapped

    return deco(fn) if fn is not None else deco


def profile_means() -> Dict[str, float]:
    """Mean seconds per scope (ref's `wait_*` logkv_mean dump)."""
    return {
        f"wait_{k}": _PROFILE_SUMS[k] / max(1, _PROFILE_COUNTS[k])
        for k in _PROFILE_SUMS
    }


def reset_profile() -> None:
    _PROFILE_SUMS.clear()
    _PROFILE_COUNTS.clear()


@contextlib.contextmanager
def trace_capture(log_dir: str):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
