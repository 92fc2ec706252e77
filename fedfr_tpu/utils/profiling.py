"""Profiling and timing hooks (SURVEY.md §5: the reference has wall-clock
spans only; the rebuild adds structured XLA traces)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

logger = logging.getLogger("fedfr_tpu.profiling")


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a log dir is given; no-op otherwise.

    View with TensorBoard or xprof against ``log_dir``.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SpanTimer:
    """Named wall-clock spans with running totals (replaces the reference's
    scattered time.time() bookkeeping)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, log=logger) -> None:
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            log.info("span %-24s total %8.2fs  calls %5d  avg %7.3fs",
                     name, self.totals[name], self.counts[name],
                     self.totals[name] / max(self.counts[name], 1))
