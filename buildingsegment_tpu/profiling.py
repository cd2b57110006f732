"""Tracing / profiling utilities (SURVEY.md §5).

The reference has no timers at all (tmc3/TMC3.cpp:202-229).  The rebuild
provides:

  * per-stage wall times — collected by the pipeline into
    ``PipelineOutput.timings`` and printed by ``--profile``;
  * Mpoints/sec derived metrics (the north-star unit);
  * :func:`trace` — a context manager wrapping ``jax.profiler`` so a
    device trace (viewable in TensorBoard/Perfetto) can be captured
    around any pipeline stage;
  * :func:`annotate` — named trace spans for custom stages.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

__all__ = ["trace", "annotate", "StageTimer", "summarize"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profiler trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named span in the device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Wall-time accumulator keyed by stage name.

    Blocks on device results (``jax.block_until_ready``) at each stop so
    async dispatch does not hide device time in the wrong stage.
    """

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def mpoints_per_sec(self, points: int, stage: Optional[str] = None) -> float:
        total = (
            self.times.get(stage, 0.0)
            if stage
            else sum(self.times.values())
        )
        return points / max(total, 1e-9) / 1e6


def summarize(timings: Dict[str, float], points: int) -> str:
    """One-line JSON summary for logs."""
    return json.dumps(
        {
            "points": points,
            "stages": {k: round(v, 4) for k, v in timings.items()},
            "mpoints_per_sec": round(
                points / max(sum(timings.values()), 1e-9) / 1e6, 3
            ),
        }
    )
