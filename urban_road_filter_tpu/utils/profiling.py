"""Tracing & profiling hooks (SURVEY.md section 5: the reference has none).

  * `stage_timer` — wall-clock stage timers for the host loop;
  * `device_trace` — context manager around jax.profiler.trace, producing a
    TensorBoard-compatible device trace of the compiled pipeline;
  * `annotate` — jax.profiler.TraceAnnotation passthrough so pipeline stages
    show up named in the trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator


class StageTimers:
    """Accumulating wall-clock timers: `with timers.stage("tensorize"): ...`"""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4),
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3),
                    "calls": self.counts[k]}
                for k, v in sorted(self.totals.items())}


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside jitted code paths for the trace viewer."""
    import jax

    return jax.profiler.TraceAnnotation(name)
