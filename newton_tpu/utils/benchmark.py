"""Timing & profiling helpers.

TPU-native equivalents of reference newton/_src/utils/benchmark.py
(EventTracer :119, @event_scope :11, run_benchmark): CUDA-event hierarchical
timing becomes wall-clock scopes around ``block_until_ready`` plus an
optional ``jax.profiler`` trace capture for op-level analysis.
"""

from __future__ import annotations

import contextlib
import functools
import json
import time
from typing import Any, Callable, Dict, List, Optional

__all__ = ["EventTracer", "event_scope", "ScopedTimer", "run_benchmark",
           "benchmark_step"]


class EventTracer:
    """Hierarchical wall-clock scope timing (reference: benchmark.py:119).

    Because XLA executes asynchronously, child scopes measure dispatch time
    unless the wrapped code blocks; ``sync=True`` inserts a
    ``block_until_ready`` on the scope result when it is a pytree of arrays.
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.root: Dict[str, Any] = {"name": "root", "children": [],
                                     "elapsed": 0.0, "count": 0}
        self._stack = [self.root]

    @contextlib.contextmanager
    def scope(self, name: str, result=None):
        node = None
        for c in self._stack[-1]["children"]:
            if c["name"] == name:
                node = c
                break
        if node is None:
            node = {"name": name, "children": [], "elapsed": 0.0, "count": 0}
            self._stack[-1]["children"].append(node)
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield node
        finally:
            if self.sync and result is not None:
                import jax
                jax.block_until_ready(result)
            node["elapsed"] += time.perf_counter() - t0
            node["count"] += 1
            self._stack.pop()

    def report(self, node=None, depth=0) -> str:
        node = node or self.root
        lines = []
        for c in node["children"]:
            avg = c["elapsed"] / max(c["count"], 1) * 1e3
            lines.append("  " * depth +
                         f"{c['name']}: {c['elapsed']*1e3:.2f} ms total, "
                         f"{avg:.3f} ms avg x{c['count']}")
            lines.append(self.report(c, depth + 1))
        return "\n".join(l for l in lines if l)


_GLOBAL_TRACER: Optional[EventTracer] = None


def event_scope(fn: Callable) -> Callable:
    """Decorator timing a function under the global tracer
    (reference: benchmark.py:11)."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        if _GLOBAL_TRACER is None:
            return fn(*a, **kw)
        with _GLOBAL_TRACER.scope(fn.__qualname__):
            out = fn(*a, **kw)
        return out

    return wrapper


class ScopedTimer:
    """Drop-in for wp.ScopedTimer (reference usage solver_xpbd.py:391)."""

    def __init__(self, name: str, active: bool = True, print_: bool = True):
        self.name = name
        self.active = active
        self.print = print_
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = (time.perf_counter() - self._t0) * 1e3
        if self.active and self.print:
            print(f"{self.name}: {self.elapsed:.3f} ms")
        return False


def benchmark_step(step_fn: Callable, state, iters: int = 20,
                   warmup: int = 3):
    """Time a jitted step function; returns (ms_per_call, final_state)."""
    import jax
    for _ in range(warmup):
        state = step_fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step_fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    return (time.perf_counter() - t0) / iters * 1e3, state


def run_benchmark(step_fn: Callable, state, frames: int, substeps: int,
                  worlds: int, dt: float, profile_dir: Optional[str] = None):
    """asv-style metric collection (reference docs/guide/development.rst:824):
    ms/world-step, world-steps/s, real-time factor."""
    import jax
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    ms, state = benchmark_step(step_fn, state, iters=frames)
    if profile_dir:
        jax.profiler.stop_trace()
    steps = substeps * worlds
    return {
        "ms_per_world_step": ms / steps,
        "world_steps_per_s": steps / (ms / 1e3),
        "rtf": steps * dt / (ms / 1e3),
        "state": state,
    }
