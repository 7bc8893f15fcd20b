"""Hierarchical timer registry — the Teuchos::TimeMonitor equivalent
(reference: FEDD_TIMER macros, core/FEDDCore.hpp:5-6; named timers in
problem/solver constructors, e.g. DAESolverInTime_def.hpp:63-74; summary
printed at exit).

Usage:
    with timer("assembly/laplace"):
        ...
    print(report())

Nesting is tracked by a path stack; `report()` prints a sorted table of
totals, counts, and percentages.  JAX note: device work is async — wrap the
timed region's result in `jax.block_until_ready` (or fetch a value) for
meaningful device timings; host-side phases (setup, partitioning, symbolic)
time correctly as-is."""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List

_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)
_stack: List[str] = []


_trace_enabled = False


def enable_profiler_annotations(on: bool = True) -> None:
    """Emit each timer scope as a named `jax.profiler.TraceAnnotation` so
    framework phases show up in TensorBoard/xprof device traces (the
    SURVEY §5 tracing prescription: scoped timers + JAX profiler)."""
    global _trace_enabled
    _trace_enabled = on


@contextmanager
def timer(name: str):
    path = "/".join(_stack + [name])
    _stack.append(name)
    ann = None
    if _trace_enabled:
        import jax.profiler

        ann = jax.profiler.TraceAnnotation(path)
        ann.__enter__()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if ann is not None:
            ann.__exit__(None, None, None)
        _stack.pop()
        _totals[path] += time.perf_counter() - t0
        _counts[path] += 1


@contextmanager
def profile_trace(log_dir: str):
    """Capture a JAX profiler trace of the enclosed region (xprof/
    TensorBoard format) with timer scopes annotated."""
    import jax.profiler

    enable_profiler_annotations(True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        enable_profiler_annotations(False)


def reset() -> None:
    _totals.clear()
    _counts.clear()


def totals() -> Dict[str, float]:
    return dict(_totals)


def report() -> str:
    if not _totals:
        return "(no timers)"
    grand = sum(v for k, v in _totals.items() if "/" not in k) or \
        sum(_totals.values())
    lines = [f"{'timer':<48} {'total [s]':>10} {'calls':>7} {'%':>6}"]
    for k in sorted(_totals):
        depth = k.count("/")
        name = "  " * depth + k.split("/")[-1]
        lines.append(f"{name:<48} {_totals[k]:>10.4f} {_counts[k]:>7} "
                     f"{100*_totals[k]/grand:>5.1f}%")
    return "\n".join(lines)
