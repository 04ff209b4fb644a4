"""First-class stage timing + optional device tracing.

The reference has no profiling subsystem (SURVEY.md SS5.1: tqdm + discarded
Patchwork timers). Here every pipeline stage runs under `stage_timer`, which
accumulates wall-clock per stage name and can wrap the run in a
jax.profiler trace (Perfetto) when AUTOINST_TRACE_DIR is set.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

_times: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_trace_active = False


@contextlib.contextmanager
def stage_timer(name: str):
    global _trace_active
    trace_dir = os.environ.get("AUTOINST_TRACE_DIR")
    start = time.perf_counter()
    if trace_dir and not _trace_active:
        import jax
        _trace_active = True
        with jax.profiler.trace(trace_dir):
            try:
                yield
            finally:
                _trace_active = False
                _record(name, start)
        return
    try:
        yield
    finally:
        _record(name, start)


def _record(name: str, start: float):
    _times[name] += time.perf_counter() - start
    _counts[name] += 1


def timing_report() -> dict:
    return {k: {"total_s": _times[k], "calls": _counts[k],
                "mean_s": _times[k] / max(_counts[k], 1)}
            for k in sorted(_times)}


def reset_timers():
    _times.clear()
    _counts.clear()


def dump_timing(path: str):
    with open(path, "w") as fh:
        json.dump(timing_report(), fh, indent=2)
