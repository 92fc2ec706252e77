"""Utility-layer tests: plotting, profiling spans, throughput logging."""

import logging
import os

import numpy as np
import pytest


def test_save_native_digit_key_dict_roundtrip(tmp_path):
    """A dict with digit-string keys (e.g. client ids) round-trips as a
    dict, and lists as lists (regression: digit keys came back as lists)."""
    from fedfr_tpu.utils.checkpoint import load_native, save_native

    tree = {"0": np.arange(3), "1": np.ones(2),
            "nested": [np.zeros(1), {"7": np.ones(1)}]}
    save_native(tree, str(tmp_path / "t"))
    out = load_native(str(tmp_path / "t"))
    assert isinstance(out, dict) and set(out) == {"0", "1", "nested"}
    assert isinstance(out["nested"], list) and len(out["nested"]) == 2
    assert isinstance(out["nested"][1], dict) and set(out["nested"][1]) == {"7"}
    np.testing.assert_array_equal(out["0"], np.arange(3))


def test_init_logging_appends_on_reinit(tmp_path):
    """--resume must not truncate the original run's training.log."""
    from fedfr_tpu.utils.logging import init_logging

    log = init_logging(str(tmp_path))
    log.info("first-run line")
    init_logging(str(tmp_path))
    logging.getLogger("fedfr_tpu").info("resumed line")
    text = open(os.path.join(str(tmp_path), "training.log")).read()
    assert "first-run line" in text and "resumed line" in text


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


def test_round_checkpointer_retention(tmp_path):
    """``keep=N`` retains only the newest N resume states after each save
    (a reference-scale round state is ~7.6 GB; 20-round runs need pruning),
    and resume restores from the newest retained round."""
    from fedfr_tpu.utils.checkpoint import RoundCheckpointer

    class _Client:
        def __init__(self, cid):
            self.cid = cid
            self.fc_local = np.full((2, 4), float(cid), np.float32)
            self.bce_vars = None
            self.last_backbone = None

    class _Server:
        def __init__(self):
            self.federated_vars = {"w": np.zeros(3, np.float32)}
            self.pretrained_fc = None
            self.clients = [_Client(0), _Client(1)]
            self.global_round = 1
            self.global_epoch = 0
            self.local_epoch = 10
            self.train_decay = 0
            self.rng = np.random.default_rng(100)

    srv = _Server()
    ckpt = RoundCheckpointer(str(tmp_path), keep=2)
    for r in (1, 2, 3):
        srv.global_round = r
        srv.federated_vars = {"w": np.full(3, float(r), np.float32)}
        ckpt.save(srv)
    names = sorted(os.listdir(str(tmp_path)))
    assert names == ["round_2.meta.json", "round_2.npz",
                     "round_3.meta.json", "round_3.npz"]
    assert ckpt.latest() == 3
    restored = RoundCheckpointer(str(tmp_path)).restore(srv)
    assert restored == 3
    np.testing.assert_array_equal(srv.federated_vars["w"],
                                  np.full(3, 3.0, np.float32))


def test_round_checkpointer_async_write(tmp_path, monkeypatch):
    """async_write hands serialization to a writer thread: wait() joins it,
    restore() sees the completed state, retention still applies, and a
    writer-thread error surfaces on the next wait()."""
    from fedfr_tpu.utils import checkpoint as ckpt_mod
    from fedfr_tpu.utils.checkpoint import RoundCheckpointer

    class _Client:
        def __init__(self, cid):
            self.cid = cid
            self.fc_local = np.full((2, 4), float(cid), np.float32)
            self.bce_vars = None
            self.last_backbone = None

    class _Server:
        def __init__(self):
            self.federated_vars = {"w": np.zeros(3, np.float32)}
            self.pretrained_fc = None
            self.clients = [_Client(0)]
            self.global_round = 1
            self.global_epoch = 0
            self.local_epoch = 10
            self.train_decay = 0
            self.rng = np.random.default_rng(100)

    srv = _Server()
    ckpt = RoundCheckpointer(str(tmp_path), keep=1, async_write=True)
    for r in (1, 2):
        srv.global_round = r
        srv.federated_vars = {"w": np.full(3, float(r), np.float32)}
        ckpt.save(srv)
    ckpt.wait()
    assert sorted(os.listdir(str(tmp_path))) == ["round_2.meta.json",
                                                 "round_2.npz"]
    assert RoundCheckpointer(str(tmp_path)).restore(srv) == 2
    np.testing.assert_array_equal(srv.federated_vars["w"],
                                  np.full(3, 2.0, np.float32))

    # writer-thread errors surface on the next wait(), not silently
    def boom(tree, path):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt_mod, "save_native", boom)
    srv.global_round = 3
    ckpt.save(srv)
    with pytest.raises(OSError, match="disk full"):
        ckpt.wait()


def test_round_checkpointer_bg_fetch(tmp_path):
    """bg_fetch snapshots device references + host copies at save() time and
    returns before fetching: values the next round REPLACES (device arrays)
    or mutates in place (host arrays) after save() must not leak into the
    checkpoint, and restore() sees the completed state after wait()."""
    import jax.numpy as jnp

    from fedfr_tpu.utils.checkpoint import RoundCheckpointer

    class _Client:
        def __init__(self, cid):
            self.cid = cid
            self.fc_local = np.full((2, 4), float(cid), np.float32)
            self.bce_vars = {"params": {"weight": jnp.full((3,), 7.0)}}
            self.last_backbone = {"params": jnp.arange(5, dtype=jnp.float32)}

    class _Server:
        def __init__(self):
            # device leaf large enough to exercise the chunked slice path
            self.federated_vars = {"w": jnp.arange(4096, dtype=jnp.float32)}
            self.pretrained_fc = None
            self.clients = [_Client(0), _Client(1)]
            self.global_round = 3
            self.global_epoch = 0
            self.local_epoch = 6
            self.train_decay = 1
            self.rng = np.random.default_rng(100)

    srv = _Server()
    ckpt = RoundCheckpointer(str(tmp_path), keep=2, bg_fetch=True)
    assert ckpt.async_write  # bg_fetch implies the writer thread
    ckpt.save(srv, extra={"best": [[0.9]]})
    # the next round replaces device state and mutates host state in place
    srv.federated_vars = {"w": jnp.zeros(4096, dtype=jnp.float32)}
    srv.clients[0].fc_local[:] = -1.0
    ckpt.wait()

    fresh = _Server()
    fresh.clients[0].fc_local[:] = 0.0
    restorer = RoundCheckpointer(str(tmp_path))
    assert restorer.restore(fresh) == 3
    np.testing.assert_array_equal(fresh.federated_vars["w"],
                                  np.arange(4096, dtype=np.float32))
    np.testing.assert_array_equal(fresh.clients[0].fc_local,
                                  np.full((2, 4), 0.0, np.float32))
    np.testing.assert_array_equal(
        np.asarray(fresh.clients[1].last_backbone["params"]),
        np.arange(5, dtype=np.float32))
    assert restorer.last_extra == {"best": [[0.9]]}
    assert fresh.local_epoch == 6 and fresh.train_decay == 1


def test_round_checkpointer_bg_fetch_chunk_equivalence(tmp_path):
    """The bg-fetch thread's chunked fetch reassembles multi-chunk leaves
    exactly (chunk_bytes boundary arithmetic is the risky part)."""
    import jax.numpy as jnp

    from fedfr_tpu.utils.checkpoint import RoundCheckpointer

    rng = np.random.default_rng(7)
    # 1500*1031*4 B ~= 6.2 MB: two uneven chunks at the 4 MB default
    big = rng.standard_normal((1500, 1031)).astype(np.float32)

    class _Client:
        def __init__(self):
            self.cid = 0
            self.fc_local = np.zeros((1, 1), np.float32)
            self.bce_vars = None
            self.last_backbone = {"params": jnp.asarray(big)}

    class _Server:
        def __init__(self):
            self.federated_vars = {"w": jnp.asarray(big.T.copy())}
            self.pretrained_fc = None
            self.clients = [_Client()]
            self.global_round = 1
            self.global_epoch = 0
            self.local_epoch = 10
            self.train_decay = 0
            self.rng = np.random.default_rng(100)

    srv = _Server()
    ckpt = RoundCheckpointer(str(tmp_path), bg_fetch=True)
    ckpt.save(srv)
    ckpt.wait()
    fresh = _Server()
    fresh.federated_vars = {"w": jnp.zeros_like(big.T)}
    fresh.clients[0].last_backbone = {"params": jnp.zeros_like(big)}
    assert RoundCheckpointer(str(tmp_path)).restore(fresh) == 1
    np.testing.assert_array_equal(fresh.federated_vars["w"], big.T)
    np.testing.assert_array_equal(
        np.asarray(fresh.clients[0].last_backbone["params"]), big)


def test_round_checkpointer_prunes_orphan_npz(tmp_path):
    """A crash mid-async-write leaves round_K.npz with no meta.json; the
    next prune pass must delete it or it defeats the --round_ckpt_keep disk
    bound forever (restore never picks it up either way)."""
    from fedfr_tpu.utils.checkpoint import RoundCheckpointer

    class _Client:
        def __init__(self, cid):
            self.cid = cid
            self.fc_local = np.full((2, 4), float(cid), np.float32)
            self.bce_vars = None
            self.last_backbone = None

    class _Server:
        def __init__(self):
            self.federated_vars = {"w": np.zeros(3, np.float32)}
            self.pretrained_fc = None
            self.clients = [_Client(0)]
            self.global_round = 1
            self.global_epoch = 0
            self.local_epoch = 10
            self.train_decay = 0
            self.rng = np.random.default_rng(100)

    # simulate the truncated npz a SIGKILLed writer leaves behind
    (tmp_path / "round_7.npz").write_bytes(b"PK\x03\x04 truncated")
    srv = _Server()
    ckpt = RoundCheckpointer(str(tmp_path), keep=2)
    ckpt.save(srv)
    assert sorted(os.listdir(str(tmp_path))) == ["round_1.meta.json",
                                                 "round_1.npz"]
    assert RoundCheckpointer(str(tmp_path)).restore(srv) == 1


def test_phase_deltas_banner_keyed():
    """Per-round phase deltas reset at each process banner, NOT on a value
    comparison: a resumed process whose first cumulative total exceeds the
    previous process's final total (fresh remote compiles) must still reset."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "logparse", os.path.join(repo, "experiments", "logparse.py"))
    logparse = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(logparse)

    log = (
        "2026-08-17 01:00:00 === Start Federated learning ===\n"
        "span phase/local_train  total  950.0s\n"
        "2026-08-17 02:00:00 training done\n"
        "2026-08-17 03:00:00 === Start Federated learning ===\n"
        "span phase/local_train  total  990.0s\n"  # >= 950: still a reset
        "span phase/local_train  total  1500.0s\n")
    assert logparse.phase_deltas(log)["phase/local_train"] == \
        [950.0, 990.0, 510.0]


def _load_fullscale():
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "fullscale_tpu", os.path.join(repo, "experiments", "fullscale_tpu.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fullscale_sample_pairs():
    """The shared .bin pair sampler (fullscale_tpu/realdata builders):
    alternating genuine/impostor, genuine = two distinct images of one ID,
    impostor = two different IDs, deterministic under a seeded rng."""
    import numpy as np

    fs = _load_fullscale()
    labels = np.repeat(np.arange(10), 5)  # 10 ids x 5 imgs
    picks, issame = fs.sample_pairs(labels, 40, np.random.default_rng(3))
    assert len(picks) == 80 and len(issame) == 40
    assert issame == [True, False] * 20
    for p in range(40):
        a, b = picks[2 * p], picks[2 * p + 1]
        if issame[p]:
            assert labels[a] == labels[b] and a != b
        else:
            assert labels[a] != labels[b]
    picks2, _ = fs.sample_pairs(labels, 40, np.random.default_rng(3))
    assert picks2 == picks


def test_fullscale_rejects_uncheckpointed_restart_config(monkeypatch):
    """--round_ckpt_every 0 would disable the checkpoints the watchdog's
    --resume restarts depend on (every restart would start over at round
    0); the harness must reject it at parse time."""
    import sys

    fs = _load_fullscale()
    monkeypatch.setattr(sys, "argv",
                        ["fullscale_tpu.py", "--round_ckpt_every", "0"])
    with pytest.raises(SystemExit):
        fs.main()


def test_fullscale_disarms_bg_fetch_after_restart(monkeypatch, tmp_path):
    """The watchdog's relaunch must drop --round_ckpt_bg_fetch: if an
    unforeseen tunnel-concurrency interaction wedged the run, recovery must
    not re-enter it (the flag only buys the ~7 min/round fetch overlap)."""
    import sys

    fs = _load_fullscale()
    (tmp_path / "val").mkdir()
    (tmp_path / "val" / "agedb_30.bin").write_bytes(b"x")
    (tmp_path / "run").mkdir()
    (tmp_path / "run" / "training.log").write_text("")

    train_cmds = []

    def fake_run(cmd, stall_timeout=None):
        if "train.py" in cmd[1]:
            train_cmds.append(list(cmd))
            if len(train_cmds) == 1:
                raise fs.Stall("wedged")
        return 1.0

    monkeypatch.setattr(fs, "run", fake_run)
    monkeypatch.setattr(
        fs, "parse_training_log", lambda p: ({}, {}, [], [], []))
    monkeypatch.setattr(sys, "argv", [
        "fullscale_tpu.py", "--work_dir", str(tmp_path), "--quick",
        "--resume", "--skip_pretrain", "--ckpt_async", "--ckpt_bg_fetch"])
    fs.main()
    assert len(train_cmds) == 2
    assert "--round_ckpt_bg_fetch" in train_cmds[0]
    assert "--round_ckpt_bg_fetch" not in train_cmds[1]
    assert "--resume" in train_cmds[1]


def test_throughput_monitor_trips_on_collapse():
    """The non-silent degradation trigger (observed: the tunnel degraded
    13x while still emitting output, so the silence watchdog never fired):
    trips only after min_samples of history and consecutive slow readings;
    warmup-grade readings (~50% of median) never trip."""
    fs = _load_fullscale()
    mon = fs._ThroughputMonitor()
    for _ in range(12):
        mon.feed("client 0 epoch 1/10 ... 3200.0 samples/sec")
    mon.feed("client 0 epoch 2/10 ... 1600.0 samples/sec")  # warmup-grade
    assert not mon.tripped
    mon.feed("client 0 epoch 3/10 ... 247.0 samples/sec")
    assert not mon.tripped  # one slow reading could be a blip
    mon.feed("client 0 epoch 4/10 ... 251.0 samples/sec")
    assert mon.tripped

    # too little history: never trips (cold-start readings are noisy)
    mon2 = fs._ThroughputMonitor()
    for _ in range(3):
        mon2.feed("... 3200.0 samples/sec")
    mon2.feed("... 10.0 samples/sec")
    mon2.feed("... 10.0 samples/sec")
    assert not mon2.tripped


def test_throughput_monitor_warns_once_on_degraded_restart(capsys):
    """A restarted attempt whose fresh median is far below the previous
    attempt's must WARN (once) rather than trip — a persistent tunnel
    degradation can't be fixed by more restarts, but it must not pass
    silently either."""
    fs = _load_fullscale()
    mon = fs._ThroughputMonitor(prior_median=3200.0)
    for _ in range(15):
        mon.feed("... 250.0 samples/sec")
    assert not mon.tripped  # converged median: deliberate non-trip
    out = capsys.readouterr().out
    assert out.count("may still be degraded") == 1

    # a healthy restart stays quiet
    mon2 = fs._ThroughputMonitor(prior_median=3200.0)
    for _ in range(15):
        mon2.feed("... 3100.0 samples/sec")
    assert "degraded" not in capsys.readouterr().out


def test_prior_median_keyed_by_command():
    """The degraded-restart warning compares throughput across attempts of
    the SAME command only: pretrain (batch 512, one model) and train.py
    (batch 64, full FedFR objective) sustain very different samples/sec, so
    a cross-phase carry-over would flag healthy first train attempts."""
    fs = _load_fullscale()
    old = list(fs._LAST_MEDIAN)
    try:
        fs._LAST_MEDIAN[:] = ["pretrain.py", 12000.0]
        assert fs._prior_median(["python", "train.py"]) is None
        assert fs._prior_median(["python", "pretrain.py"]) == 12000.0
    finally:
        fs._LAST_MEDIAN[:] = old


def test_posttrain_rejects_spec_mismatch(monkeypatch, tmp_path):
    """posttrain_eval_tpu must refuse to evaluate a run_dir against a spec
    other than the one its training harness recorded (<work_dir>/spec.json)
    — a mismatched universe silently produces garbage TPR tables."""
    import importlib.util
    import json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "posttrain_eval_tpu",
        os.path.join(repo, "experiments", "posttrain_eval_tpu.py"))
    pt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pt)

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "backbone_0.npz").write_bytes(b"x")
    (tmp_path / "spec.json").write_text(
        json.dumps({"spec": "synth:clients=2,ids_per_client=4"}))
    monkeypatch.setattr(sys, "argv", [
        "posttrain_eval_tpu.py", "--run_dir", str(run_dir),
        "--spec", "synth:clients=40,ids_per_client=100"])
    with pytest.raises(SystemExit, match="does not match the spec"):
        pt.main()


def test_ckpt_fetch_retries_transient_resource_exhausted(monkeypatch):
    """The bg-fetch runs concurrently with the next round's compute and can
    transiently lose the HBM race (measured live: RESOURCE_EXHAUSTED
    mid-fetch at 40 resident client states).  _fetch_releasing must retry
    with backoff instead of aborting, and still raise on persistent
    exhaustion or unrelated errors."""
    import numpy as np

    from fedfr_tpu.utils import transfer
    from fedfr_tpu.utils.checkpoint import RoundCheckpointer

    real = transfer.chunked_device_get
    fails = {"n": 2}

    def flaky(tree):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise RuntimeError("TPU backend error (ResourceExhausted): "
                               "RESOURCE_EXHAUSTED")
        return real(tree)

    monkeypatch.setattr(transfer, "chunked_device_get", flaky)
    monkeypatch.setattr("time.sleep", lambda s: None)
    tree = {"a": np.arange(4.0), "b": np.ones(2)}
    out = RoundCheckpointer._fetch_releasing([tree])
    np.testing.assert_array_equal(out["a"], np.arange(4.0))

    def broken(tree):
        raise RuntimeError("something else entirely")

    monkeypatch.setattr(transfer, "chunked_device_get", broken)
    with pytest.raises(RuntimeError, match="something else"):
        RoundCheckpointer._fetch_releasing([tree])


def test_fullscale_rejects_undercovering_veri_spec(monkeypatch, tmp_path):
    """The synthetic veri split's gids are the FL pool's identity range
    (data/synthetic.py:329): a spec whose veri_ids < clients*ids_per_client
    leaves the tail clients with no veri presence and their personalized
    TPR tables degenerate to TPR=FPR (observed live, ref20 attempt 1).
    The harness must refuse it up front."""
    import sys

    fs = _load_fullscale()
    monkeypatch.setattr(sys, "argv", [
        "fullscale_tpu.py", "--work_dir", str(tmp_path / "w"), "--cpu",
        "--spec_extra", "veri_ids=100,veri_imgs=8"])
    with pytest.raises(SystemExit):
        fs.main()


def test_fullscale_watchdog_kills_degraded_subprocess():
    """run() kills + raises Stall when throughput collapses without output
    silence."""
    import sys

    fs = _load_fullscale()
    prog = (
        "import time\n"
        "for i in range(12):\n"
        "    print(f'epoch {i} ... 100.0 samples/sec', flush=True)\n"
        "for i in range(2):\n"
        "    print(f'epoch {12+i} ... 5.0 samples/sec', flush=True)\n"
        "    time.sleep(1)\n"
        "time.sleep(120)\n")
    with pytest.raises(fs.Stall, match="throughput collapsed"):
        fs.run([sys.executable, "-c", prog], stall_timeout=8.0)


def test_fullscale_watchdog_kills_silent_subprocess():
    """The harness watchdog raises Stall when the subprocess stops emitting
    output (the rig's tunneled PJRT connection can wedge mid-device-call
    with silence as the only symptom, CLAUDE.md) — and the kill must not
    wait for the wedged process to exit on its own."""
    import sys
    import time

    fs = _load_fullscale()
    t0 = time.time()
    with pytest.raises(fs.Stall):
        fs.run([sys.executable, "-c",
                "print('one line', flush=True); import time; time.sleep(120)"],
               stall_timeout=3.0)
    assert time.time() - t0 < 60  # killed, not slept out


def test_fullscale_liveness_gate_kills_bannering_subprocess():
    """run()'s launch-liveness gate: a subprocess that keeps printing but
    never emits the liveness pattern is killed at the liveness deadline.
    The round-4 ref20 loss mode was a pretrain that printed its banners
    then remote-compiled silently for 15+ min — chatty enough early that
    nothing fired before the session ended."""
    import sys
    import time

    fs = _load_fullscale()
    t0 = time.time()
    with pytest.raises(fs.Stall, match="liveness"):
        fs.run([sys.executable, "-c",
                "import time\n"
                "print('banner', flush=True)\n"
                "time.sleep(120)\n"],
               stall_timeout=None, liveness=(r"samples/sec", 2.0))
    assert time.time() - t0 < 60  # killed at the gate, not slept out


def test_fullscale_liveness_gate_passes_once_pattern_seen():
    """Once the liveness pattern appears, the gate disarms: a subprocess
    slower than the liveness deadline but emitting step lines completes."""
    import sys

    fs = _load_fullscale()
    dt = fs.run([sys.executable, "-c",
                 "import time\n"
                 "print('x 50.0 samples/sec', flush=True)\n"
                 "time.sleep(3)\n"
                 "print('done', flush=True)\n"],
                stall_timeout=30.0, liveness=(r"samples/sec", 2.0))
    assert dt < 60


def test_fullscale_watchdog_passes_healthy_subprocess():
    """A chatty subprocess under the same stall_timeout completes normally
    and run() returns its wall time."""
    import sys

    fs = _load_fullscale()
    dt = fs.run([sys.executable, "-c",
                 "import time\n"
                 "for i in range(10):\n"
                 "    print('tick', i, flush=True); time.sleep(0.2)"],
                stall_timeout=8.0)
    assert dt < 60


def test_harvest_client_walls_reset_across_processes(tmp_path, capsys):
    """harvest_fullscale pairs consecutive client-start stamps into walls;
    a watchdog-restarted run appends a second process whose first client is
    [1/N] again — the dead process's last client must NOT pair with it
    (hours of stall gap would read as one client's wall)."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "harvest_fullscale",
        os.path.join(repo, "experiments", "harvest_fullscale.py"))
    hf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(hf)

    log = tmp_path / "training.log"
    log.write_text(
        "2026-08-18 04:00:00 === Start Federated learning ===\n"
        "2026-08-18 04:00:00 ====== Round 0 ======\n"
        "2026-08-18 04:00:10 round 0 [1/3] client 0 training\n"
        "2026-08-18 04:01:10 round 0 [2/3] client 1 training\n"
        # client 1 wedges here; watchdog restarts 2 h later
        "2026-08-18 06:00:00 === Start Federated learning ===\n"
        "2026-08-18 06:00:00 ====== Round 0 ======\n"
        "2026-08-18 06:00:10 round 0 [1/3] client 0 training\n"
        "2026-08-18 06:01:20 round 0 [2/3] client 1 training\n"
        "2026-08-18 06:02:20 round 0 [3/3] client 2 training\n"
        "2026-08-18 06:03:20 training done\n")
    import json as _json

    hf.main(str(log))
    out = _json.loads(capsys.readouterr().out)
    walls = out["client_wall_s"]["0"]
    # pairs: (c0->c1) x2 processes + (c1->c2) in the second; NO 2-hour pair
    assert walls["n"] == 3
    assert walls["max"] <= 70.0
