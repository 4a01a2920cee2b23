"""Tracing and phase timing.

The reference has no profiling of any kind (SURVEY.md §5 — only eOMPL
wraps one wall-clock around solve). Here: `jax.profiler` traces for
XLA-level inspection plus lightweight host-side phase timers whose
reports feed the benchmark harness.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

from .platform import sync

_PHASES: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def phase_timer(name: str, result=None) -> Iterator[None]:
    """Wall-time a phase; pass ``result`` (a pytree produced inside) via
    closure-free style: time is recorded on exit after syncing it."""
    t0 = time.time()
    try:
        yield
    finally:
        if result is not None:
            sync(result)
        _PHASES[name].append(time.time() - t0)


def phase_report(reset: bool = True) -> Dict[str, dict]:
    out = {}
    for name, times in _PHASES.items():
        out[name] = {
            "calls": len(times),
            "total_s": sum(times),
            "mean_ms": 1e3 * sum(times) / max(len(times), 1),
        }
    if reset:
        _PHASES.clear()
    return out


@contextlib.contextmanager
def trace(logdir: str = "/tmp/etol_tpu_trace") -> Iterator[None]:
    """jax.profiler trace around a region; view with tensorboard or
    xprof. No-op fallback if the profiler is unavailable on the
    platform."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
