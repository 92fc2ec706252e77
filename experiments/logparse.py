"""Shared training.log parsing for the fullscale harness + harvester.

A resumed run appends several processes to one training.log, and each
process restarts its cumulative ``span phase/...`` totals at zero.  The
reset is keyed on the per-process "=== Start Federated learning ===" banner
(train.py logs it exactly once per process, before any span report) rather
than on a value comparison: a resumed process's first cumulative total can
meet or exceed the previous process's final total (first rounds re-pay
remote compiles), which a ``b >= a`` heuristic silently misreads as a
continuation and reports a tiny cross-process delta.
"""

import bisect
import re


def phase_deltas(text: str) -> dict:
    """Per-round deltas of the cumulative ``span phase/<name> total Xs``
    reports, resetting the running baseline at each process banner."""
    banners = [m.start() for m in
               re.finditer(r"=== Start Federated learning ===", text)]
    spans = {}
    for m in re.finditer(r"span (phase/\S+)\s+total\s+([0-9.]+)s", text):
        spans.setdefault(m.group(1), []).append(
            (bisect.bisect_right(banners, m.start()), float(m.group(2))))
    out = {}
    for name, vals in spans.items():
        deltas, prev_total, prev_proc = [], 0.0, None
        for proc, total in vals:
            if proc != prev_proc:
                prev_total, prev_proc = 0.0, proc
            deltas.append(round(total - prev_total, 1))
            prev_total = total
        out[name] = deltas
    return out
