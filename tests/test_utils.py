"""Utility-layer tests: plotting, profiling spans, throughput logging."""

import logging
import os

import numpy as np
import pytest


def test_plot_roc_curves(tmp_path):
    pytest.importorskip("matplotlib")
    from fedfr_tpu.utils.plot import plot_roc_curves

    rng = np.random.default_rng(0)
    fpr = np.sort(rng.random(50))
    tpr = np.sort(rng.random(50))
    out = plot_roc_curves({"clientA": (fpr, tpr), "clientB": (fpr, tpr ** 2)},
                          str(tmp_path / "roc.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_span_timer_report(caplog):
    import time

    from fedfr_tpu.utils.profiling import SpanTimer

    t = SpanTimer()
    with t.span("alpha"):
        time.sleep(0.01)
    with t.span("alpha"):
        pass
    with t.span("beta"):
        pass
    assert t.counts["alpha"] == 2 and t.counts["beta"] == 1
    assert t.totals["alpha"] >= 0.01
    logger = logging.getLogger("test_spans")
    with caplog.at_level(logging.INFO, logger="test_spans"):
        t.report(logger)
    assert sum("span" in r.message for r in caplog.records) == 2


def test_xla_trace_noop_and_real(tmp_path):
    from fedfr_tpu.utils.profiling import xla_trace

    with xla_trace(None):  # no-op path
        pass
    import jax
    import jax.numpy as jnp

    trace_dir = str(tmp_path / "trace")
    with xla_trace(trace_dir):
        jnp.ones(8).sum().block_until_ready()
    assert os.path.isdir(trace_dir) and os.listdir(trace_dir)


def test_throughput_logger(caplog):
    from fedfr_tpu.utils.logging import AverageMeter, ThroughputLogger

    meter = AverageMeter()
    logger = logging.getLogger("test_tput")
    tlog = ThroughputLogger(frequent=2, total_step=10, batch_size=4,
                            logger=logger)
    with caplog.at_level(logging.INFO, logger="test_tput"):
        for step in range(1, 7):
            meter.update(1.0)
            tlog(step, meter, epoch=0)
    assert any("samples/sec" in r.message for r in caplog.records)
