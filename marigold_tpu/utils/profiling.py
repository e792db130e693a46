"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5: only tqdm bars); for TPU serving we
provide: jax.profiler trace capture (TensorBoard-viewable), lightweight
per-phase wall timers with device sync, and a phase report. Enable traces
with MARIGOLD_TPU_TRACE_DIR=/path or the `trace` context manager.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)

_TRACE_DIR = os.environ.get("MARIGOLD_TPU_TRACE_DIR")


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace (XLA ops + host) into `log_dir`."""
    log_dir = log_dir or _TRACE_DIR
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


class PhaseTimer:
    """Accumulating wall-clock phase timer with device synchronization.

    with timer.phase("denoise"): out = fn(...)   # blocks on exit
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            value = box.get("result", result)
            if value is not None and self.sync:
                jax.block_until_ready(value)
            elif self.sync:
                jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        lines = ["phase                     total_s   calls   share"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name:24s} {t:8.3f} {self.counts[name]:7d} {t/total:6.1%}"
            )
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


def annotate(name: str):
    """jax.named_scope pass-through for HLO-level annotations."""
    return jax.named_scope(name)
