"""Profiling / tracing hooks (SURVEY.md §5: the reference has only
wall-clock prints; the TPU build adds jax.profiler traces + phase timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) when
    ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Named phase wall-clock accumulator; prints a per-phase summary."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] = (self.totals.get(name, 0.0)
                                 + time.time() - t0)

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [f"{name}: {secs:.3f}s ({100 * secs / total:.1f}%)"
                 for name, secs in sorted(self.totals.items(),
                                          key=lambda kv: -kv[1])]
        return "\n".join(lines)


def annotate(name: str):
    """Decorator adding a named TraceAnnotation around a function (shows up
    in profiler timelines)."""
    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)
        return wrapped
    return deco
