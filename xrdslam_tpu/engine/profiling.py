"""Per-phase wall-clock timers (SURVEY §5 observability).

The reference scatters `time.time()` prints through its tracker/mapper;
here a process-global registry accumulates named phase timings that the
pipeline dumps to ``timings.json`` at the end of a run, and
``jax.profiler`` traces can be toggled around any phase for deep dives.

Usage::

    from xrdslam_tpu.engine.profiling import phase_timer, timing_summary
    with phase_timer("tracking"):
        ...
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

_ACC: Dict[str, float] = defaultdict(float)
_CNT: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _ACC[name] += time.perf_counter() - t0
        _CNT[name] += 1


def timing_summary() -> Dict[str, Dict[str, float]]:
    """{phase: {total_s, count, mean_ms}} accumulated so far."""
    return {
        k: {
            "total_s": round(_ACC[k], 4),
            "count": _CNT[k],
            "mean_ms": round(1e3 * _ACC[k] / max(_CNT[k], 1), 2),
        }
        for k in sorted(_ACC)
    }


def reset_timers() -> None:
    _ACC.clear()
    _CNT.clear()


@contextlib.contextmanager
def jax_trace(out_dir: str) -> Iterator[None]:
    """Wrap a phase in a jax.profiler trace (view with TensorBoard or
    Perfetto)."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
