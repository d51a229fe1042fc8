"""Profiling helpers — the TPU equivalent of nerfstudio's
@profiler.time_function decorator + trace capture (SURVEY.md §5.1).

`time_function` measures wall time with device sync and accumulates
per-name stats; `trace` wraps jax.profiler for on-device traces (viewable
in TensorBoard / xprof).
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict

import jax

_STATS: Dict[str, list] = defaultdict(list)


def time_function(fn=None, *, name: str = None):
    """Decorator: sync + time each call; stats in profiling.stats()."""
    def wrap(f):
        label = name or f.__qualname__

        @functools.wraps(f)
        def inner(*args, **kwargs):
            t0 = time.perf_counter()
            out = f(*args, **kwargs)
            jax.block_until_ready(out)
            _STATS[label].append(time.perf_counter() - t0)
            return out

        return inner

    return wrap(fn) if fn is not None else wrap


def stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for k, v in _STATS.items():
        out[k] = {"count": len(v), "total_s": sum(v),
                  "mean_ms": 1e3 * sum(v) / max(len(v), 1),
                  "last_ms": 1e3 * v[-1]}
    return out


def reset():
    _STATS.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: `with trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
