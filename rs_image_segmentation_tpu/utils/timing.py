"""Tracing / profiling helpers (the reference has none — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Wall-clock timings with device synchronization per stage."""

    def __init__(self):
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.timings[name] = self.timings.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.timings.values())
        lines = [f"{k:<28}{v * 1000:>10.1f} ms" for k, v in self.timings.items()]
        lines.append(f"{'total':<28}{total * 1000:>10.1f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
