"""Profiling / tracing hooks (SURVEY.md §5: the reference has only
wall-clock prints; the TPU build adds jax.profiler traces + phase timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def fence(tree) -> None:
    """Reliable completion fence for device computations.

    ``jax.block_until_ready`` can return before the execution has actually
    finished on the remote TPU backend used here (measured: bur-only
    timings under-read a 3.5 ms conv as ~0.001 ms). Fetching one element
    of each output buffer to the host is the only dependable fence — the
    fetch cannot complete until the producing program has.
    """
    def _get_one(arr) -> None:
        el = arr.ravel()[:1]
        if jnp.issubdtype(el.dtype, jnp.complexfloating):
            # complex device->host transfers are unsupported on this
            # backend; fetching the real part fences just as well
            el = el.real
        jax.device_get(el)

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            # sharded output: one element of element-0 only waits for the
            # device holding that shard — fetch one element PER shard so
            # every device's stream is drained before we return. A
            # zero-size shard (uneven sharding) has nothing to fetch and
            # an empty fetch need not block on that device's stream, so
            # skip it and fall back to block_until_ready for the leaf.
            # CAVEAT: block_until_ready is the primitive this fence exists
            # to work around (it can return early on the remote backend),
            # so for leaves with zero-size shards the fence is only as
            # strong as bur — timings over unevenly-sharded outputs may
            # under-read. Prefer even shardings (wrap-padding) when the
            # fence matters; there is no device-targeted dummy fetch that
            # is ordered after the producing program on this backend
            # (transfers ride a separate stream).
            fetched_all = True
            for shard in leaf.addressable_shards:
                if shard.data.size:
                    _get_one(shard.data)
                else:
                    fetched_all = False
            if not fetched_all:
                jax.block_until_ready(leaf)
        elif hasattr(leaf, "ravel"):
            _get_one(leaf)


def steady_state(run, *args, reps: int = 2):
    """Shared benchmark harness: time ``run(*args)`` once for the
    first-call cost (compile + first execution through the remote
    backend), then return the best of ``reps`` further calls as the
    steady-state time.

    ``run`` must fence its own outputs (call :func:`fence` on them) —
    otherwise the timings under-read (CLAUDE.md timing rules). Returns
    ``(first_s, steady_s, last_output)``.
    """
    t0 = time.time()
    out = run(*args)
    first = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = run(*args)
        best = min(best, time.time() - t0)
    return first, best, out


def enable_compilation_cache() -> None:
    """Persistent-compilation-cache hook for bench/profile scripts.

    The package __init__ already configures the cache at import (honoring
    the ASR_JAX_CACHE / ASR_NO_JAX_CACHE env controls); this re-applies the
    same configuration rather than duplicating it, so the env opt-out keeps
    working for scripts that call it explicitly.
    """
    from .. import _enable_compilation_cache
    _enable_compilation_cache()


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
                fence(block_on)
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
