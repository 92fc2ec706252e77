"""The reference-scale FedFR workload, measured end-to-end on real TPU.

Drives the run.sh configuration (reference run.sh: sphnet/sphere64, 40
clients x 100 IDs, lr 0.001, local_epoch 10 adaptively decaying, every FedFR
mechanism on) through the REAL CLI chain — ``pretrain.py`` then ``train.py``
— at the TRUE workload multiplicities (420,671-image / 6000-ID public set,
160k local-verification set, SURVEY.md §6), for a configurable number of
rounds, and reports measured per-round wall clock, the per-phase breakdown
(public embed / mining / local train / aggregate / local eval), and memory
peaks.

Images come from the device-synthetic data plane (``--rec_root synth:...``,
fedfr_tpu/data/synthetic.py): identity-structured batches generated on
device.  On this dev rig that is the only honest option — the tunneled PJRT
relay leaks host RSS 1:1 with uploaded bytes (CLAUDE.md), and a 40-client
round moves ~400 GB of batches.  The host JPEG data plane is measured
separately (experiments/input_pipeline_tpu.py); production hosts feed real
data over PCIe at rates this workload never saturates.

Usage:
    python experiments/fullscale_tpu.py --work_dir /tmp/fullscale \
        [--rounds 2] [--pretrain_epochs 2] [--quick]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from logparse import phase_deltas  # noqa: E402

FULL_SPEC = "synth:clients=40,ids_per_client=100,block=8"
QUICK_SPEC = ("synth:clients=4,ids_per_client=8,public_ids=60,"
              "public_imgs=4000,veri_ids=32,veri_imgs=8")


def sample_pairs(labels, n_pairs: int, rng):
    """Balanced verification pairs over a label vector.

    Returns ``(picks, issame)``: ``picks`` is a flat ``2*n_pairs`` index
    list into the dataset, alternating genuine (even p) and impostor
    (odd p) pairs — the agedb-style .bin layout.  Shared by the synthetic
    (make_synth_bin) and real-JPEG (realdata_train_tpu.build_data) .bin
    builders so the 50/50 balance and replace=False semantics can't drift
    between the two copies."""
    by_id = {}
    for i, l in enumerate(labels):
        by_id.setdefault(int(l), []).append(i)
    ids = sorted(by_id)
    picks, issame = [], []
    for p in range(n_pairs):
        if p % 2 == 0:
            pid = ids[rng.integers(len(ids))]
            a, b = rng.choice(by_id[pid], size=2, replace=False)
            issame.append(True)
        else:
            i1, i2 = rng.choice(len(ids), size=2, replace=False)
            a = rng.choice(by_id[ids[i1]])
            b = rng.choice(by_id[ids[i2]])
            issame.append(False)
        picks.extend([int(a), int(b)])
    return picks, issame


def make_synth_bin(out_path: str, spec: str, n_pairs: int, image_size: int,
                   seed: int = 100) -> None:
    """AgeDB-style pair .bin from the synthetic universe's veri split (raw
    codec payloads; verification decodes them like any rec image)."""
    import pickle

    # honor FEDFR_PLATFORM (e.g. the harness's --cpu): the synthetic split
    # generates images on whatever backend attaches, and without this the
    # subprocess ignores the override and grabs the TPU
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()

    from fedfr_tpu.data import codec
    from fedfr_tpu.data.synthetic import build_fl_synthetic, parse_synth_spec

    sp = parse_synth_spec(spec)
    sp["image_size"] = image_size
    veri = build_fl_synthetic(sp)["veri"]
    picks, issame = sample_pairs(veri.all_labels(), n_pairs,
                                 np.random.default_rng(seed + 3))
    # batched device generation, chunked download (<=100 imgs ~ 3.7 MB)
    bins = []
    for s in range(0, len(picks), 100):
        imgs, _ = veri.device_batch(np.asarray(picks[s:s + 100]))
        for im in np.asarray(imgs):
            bins.append(codec.encode_raw(im))
        # progress keeps the parent's silence watchdog fed (run() restarts
        # the subprocess on a wedged tunnel call, CLAUDE.md)
        print(f"synth_bin: {min(s + 100, len(picks))}/{len(picks)} imgs",
              flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # atomic: a watchdog kill mid-write must not leave a truncated .bin
    # that a resumed harness would skip regenerating
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump((bins, issame), f)
    os.replace(tmp, out_path)


RUN_ENV = dict(os.environ)


class Stall(RuntimeError):
    """The subprocess produced no output for stall_timeout seconds, or its
    training throughput collapsed (see run()'s degradation trigger)."""


# throughput-degradation trigger: consecutive samples/sec readings below
# this fraction of the run's median (with at least MIN_SAMPLES of history)
# count as a stall.  Observed failure mode (2026-08-19, round-0 launch):
# the tunnel degraded to 247 samples/s — 13x below the 3,236 steady state —
# for a 29-minute epoch WITHOUT ever going silent, so the silence watchdog
# never fired.  A kill+--resume restart costs ~20 min; a persistent 13x
# slowdown costs ~26 min per 2-minute epoch, so restarting wins after the
# second slow reading.  Warmup epochs legitimately read ~50% of median
# (compile amortization) — far above the 20% trip point.
DEGRADED_FRACTION = 0.2
DEGRADED_CONSECUTIVE = 2
DEGRADED_MIN_SAMPLES = 10

# median of the last completed attempt's readings (within this harness
# process): lets a restarted attempt warn when it comes back degraded
# (command identity, median): the restart-degradation check only compares
# throughput across attempts of the SAME command — pretrain and train.py
# sustain very different samples/sec, so a cross-phase carry-over would
# emit false "tunnel may still be degraded" warnings on healthy first runs
_LAST_MEDIAN = [None, None]


def _prior_median(cmd):
    """Median throughput of the previous attempt of this SAME command (None
    for any other command: cross-phase comparisons are meaningless)."""
    return _LAST_MEDIAN[1] if _LAST_MEDIAN[0] == cmd[1] else None


class _ThroughputMonitor:
    """Tracks 'X samples/sec' readings from the output stream and flags a
    persistent collapse."""

    def __init__(self, fraction=DEGRADED_FRACTION,
                 consecutive=DEGRADED_CONSECUTIVE,
                 min_samples=DEGRADED_MIN_SAMPLES,
                 prior_median=None):
        self.fraction = fraction
        self.consecutive = consecutive
        self.min_samples = min_samples
        self.prior_median = prior_median
        self.prior_warned = False
        self.history = []
        self.slow_streak = 0
        self.tripped = False

    def feed(self, line: str) -> None:
        m = re.search(r"([0-9.]+) samples/sec", line)
        if not m:
            return
        v = float(m.group(1))
        # a restarted attempt's fresh median converges to whatever rate the
        # relaunch sustains — deliberate (a legitimately bigger workload must
        # not trip forever), but if that rate is far below the PREVIOUS
        # attempt's median the tunnel is still degraded: say so once instead
        # of silently crawling for the rest of the run
        if (self.prior_median and not self.prior_warned
                and len(self.history) == self.min_samples
                and float(np.median(self.history)) < 0.5 * self.prior_median):
            self.prior_warned = True
            print(f"WARNING: post-restart throughput median "
                  f"{float(np.median(self.history)):.0f} samples/sec is "
                  f"<50% of the previous attempt's "
                  f"{self.prior_median:.0f} — the tunnel may still be "
                  "degraded; this attempt will NOT re-trip on it",
                  flush=True)
        if len(self.history) >= self.min_samples:
            median = float(np.median(self.history))
            if v < self.fraction * median:
                self.slow_streak += 1
                if self.slow_streak >= self.consecutive:
                    self.tripped = True
            else:
                self.slow_streak = 0
        # a degraded reading still joins the history: if the NEW rate is the
        # true steady state (e.g. a legitimately bigger workload), the median
        # converges to it and the monitor stops tripping after a restart
        self.history.append(v)


def run(cmd, log_path=None, stall_timeout=None, liveness=None):
    """Stream cmd's output.  With stall_timeout set, watchdog the stream:
    the axon tunnel's PJRT connection can wedge mid-device-call (observed:
    tcp_recvmsg blocked 45+ min while a FRESH client on the same backend
    executes fine), and a wedged call never returns — output silence is the
    only detectable symptom.  Legit silent windows on this rig are bounded
    by the round-checkpoint fetch (~20 min), so the default timeout in
    main() stays above that.  The same watchdog also kills on a NON-silent
    throughput collapse (_ThroughputMonitor): the tunnel has been observed
    degrading 13x while still emitting output.

    ``liveness=(regex, seconds)``: launch-liveness gate — the regex must
    match SOME output line within ``seconds`` of launch, else the process
    is killed and a Stall raised.  The round-4 ref20 loss mode was a
    pretrain that kept printing banner lines but never reached step 1
    (15+ min unrolled remote compile) inside a silence timeout that
    therefore never fired."""
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    stalled = None
    live_re = re.compile(liveness[0]) if liveness else None
    live_ok = [live_re is None]
    with open(log_path, "a") if log_path else open(os.devnull, "w") as sink:
        p = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True, env=RUN_ENV)
        last = [time.time()]
        mon = _ThroughputMonitor(prior_median=_prior_median(cmd))

        def pump():
            for line in p.stdout:
                print(line, end="", flush=True)
                sink.write(line)
                last[0] = time.time()
                if stall_timeout:
                    mon.feed(line)
                if not live_ok[0] and live_re.search(line):
                    live_ok[0] = True

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        poll = min(15.0, stall_timeout / 2) if stall_timeout else 15.0
        while t.is_alive():
            t.join(timeout=poll)
            if not t.is_alive():
                continue
            if (not live_ok[0]) and time.time() - t0 > liveness[1]:
                stalled = (f"liveness: no line matching {liveness[0]!r} "
                           f"within {liveness[1]:.0f}s of launch")
            elif not stall_timeout:
                continue
            elif time.time() - last[0] > stall_timeout:
                stalled = f"no output for {stall_timeout:.0f}s"
            elif mon.tripped:
                stalled = (f"throughput collapsed: last readings "
                           f"{mon.history[-mon.consecutive:]} vs median "
                           f"{float(np.median(mon.history)):.0f} samples/sec")
            if stalled:
                p.kill()  # closes the pipe -> pump exits
                break
        t.join()
        p.wait()
    if len(mon.history) >= mon.min_samples:
        _LAST_MEDIAN[:] = [cmd[1], float(np.median(mon.history))]
    if stalled:
        raise Stall(f"{cmd[0]} {cmd[1]}: {stalled}")
    if p.returncode != 0:
        raise RuntimeError(f"{cmd[0]} {cmd[1]} failed rc={p.returncode}")
    return time.time() - t0


def parse_training_log(path: str):
    """Round wall-clocks, per-round phase deltas, memory lines."""
    text = open(path).read()
    # timestamped round starts
    stamps = [(m.group(1), int(m.group(2))) for m in re.finditer(
        r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*====== Round (\d+) ======",
        text)]
    # per-round deltas of the cumulative span totals, reset per process
    # banner (shared with harvest_fullscale.py)
    phases = phase_deltas(text)
    mem = [(float(m.group(1)), float(m.group(2)), float(m.group(3)))
           for m in re.finditer(
               r"device in_use (\d+) MB peak (\d+) MB \| host maxrss (\d+) MB",
               text)]
    mined = [int(m.group(1)) for m in re.finditer(
        r"(\d+) imgs \((\d+) IDs\) hard negative", text)]
    losses = [float(m.group(1)) for m in re.finditer(
        r"avg client loss ([0-9.\-naif]+)", text)]
    return stamps, phases, mem, mined, losses


def main():
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/fullscale")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--pretrain_epochs", type=int, default=2)
    ap.add_argument("--local_epoch", type=int, default=10)
    ap.add_argument("--network", default="sphnet")
    ap.add_argument("--embedding_size", type=int, default=512)
    ap.add_argument("--quick", action="store_true",
                    help="miniature multiplicities (CI / smoke)")
    ap.add_argument("--spec_extra", default="",
                    help="extra synth-spec keys appended to the workload "
                    "spec, e.g. 'expr=0.5,shift_div=4,noise=30' (the "
                    "difficulty knobs, fedfr_tpu/data/synthetic.py)")
    ap.add_argument("--cpu", action="store_true",
                    help="run the CLI subprocesses on the CPU backend")
    ap.add_argument("--skip_pretrain", action="store_true",
                    help="reuse work_dir/pre from an earlier run")
    ap.add_argument("--ckpt_async", action="store_true",
                    help="overlap round-checkpoint serialization with the "
                    "next round (train.py --round_ckpt_async); cuts the "
                    "per-round critical-path checkpoint cost to the device "
                    "fetch alone")
    ap.add_argument("--ckpt_bg_fetch", action="store_true",
                    help="also overlap the device->host checkpoint fetch "
                    "with the next round (train.py --round_ckpt_bg_fetch); "
                    "on this rig the fetch is ~19 min of tunnel time per "
                    "round that otherwise blocks the round loop")
    ap.add_argument("--cache_contrastive", action="store_true",
                    help="enable the per-round frozen-MOON feature cache "
                    "(train.py --cache_contrastive)")
    ap.add_argument("--lockstep", type=int, default=1,
                    help="clients resident per client-axis slice (train.py "
                    "--lockstep); >1 runs the client-parallel round on the "
                    "single chip with several clients batched per dispatch")
    ap.add_argument("--resume", action="store_true",
                    help="resume train.py from its round checkpoints")
    ap.add_argument("--stall_timeout", type=float, default=1800,
                    help="watchdog: restart train.py (with --resume) after "
                    "this many seconds of output silence; 0 disables")
    def ckpt_cadence(v):
        # 0 disables round checkpoints while the stall watchdog still
        # relaunches with --resume — every restart silently starts over at
        # round 0, burning max_restarts full-run attempts.  Long programs
        # must keep >= 1; short deadline-boxed sprints may accept the risk
        # explicitly (0 prints a loud warning at launch).
        iv = int(v)
        if iv < 0:
            raise argparse.ArgumentTypeError(
                "--round_ckpt_every must be >= 0")
        if iv == 0:
            print("WARNING: --round_ckpt_every 0 — no resume state will be "
                  "written; any watchdog restart starts over at round 0 "
                  "(train.py still exports the FINAL round's backbone for "
                  "the post-training ritual)", flush=True)
        return iv

    ap.add_argument("--round_ckpt_every", type=ckpt_cadence, default=1,
                    help="checkpoint cadence (train.py --round_ckpt_every); "
                    "raise to amortize the ~7.6 GB resume-state device fetch "
                    "over several rounds at the cost of coarser restart "
                    "granularity")
    ap.add_argument("--max_restarts", type=int, default=4)
    ap.add_argument("--pgid_file", default="",
                    help="write this process's own process-group id here at "
                    "startup.  The launcher's `echo $!` equals the pgid only "
                    "under a non-interactive shell (no job control); from an "
                    "interactive bash, setsid forks and $! is a dead pid — "
                    "the deadman's `kill -- -$pg` would silently no-op")
    ap.add_argument("--hn_threshold", type=float, default=0.4,
                    help="hard-negative mining cosine threshold (train.py "
                    "--HN_threshold).  The reference's 0.4 (config.py:28) is "
                    "tuned for real MS1M embedding geometry; the hardened "
                    "synthetic universe (expr/noise knobs) is more compact — "
                    "at 0.4 mining selects ALL 420k public images and a "
                    "round balloons ~15x.  Calibrate with "
                    "experiments/hn_probe.py to the unhardened mined "
                    "fraction (~27k imgs/client): expr=0.6,noise=25 -> 0.71")
    ap.add_argument("--hn_cap", type=int, default=0,
                    help="cap the mined set at the N hardest public images "
                    "(train.py --HN_cap; 0 = uncapped reference semantics). "
                    "Safety valve for single-shot budgeted runs where an "
                    "uncalibrated threshold ballooning mining would blow the "
                    "wall-clock budget")
    args = ap.parse_args()

    if args.pgid_file:
        tmp = args.pgid_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(os.getpgid(0)))
        os.replace(tmp, args.pgid_file)
    if args.cpu:
        RUN_ENV["FEDFR_PLATFORM"] = "cpu"
    spec = QUICK_SPEC if args.quick else FULL_SPEC
    if args.spec_extra:
        spec += "," + args.spec_extra
    w = args.work_dir
    pre = os.path.join(w, "pre")
    run_dir = os.path.join(w, "run")
    val_dir = os.path.join(w, "val")
    if not (args.skip_pretrain or args.resume) and os.path.exists(w):
        shutil.rmtree(w)
    os.makedirs(w, exist_ok=True)

    # the pretrain artifact and the val .bin are spec-dependent: a reused
    # work_dir (--skip_pretrain / --resume) from a DIFFERENT universe would
    # silently measure the trajectory against the wrong verification pairs
    spec_marker = os.path.join(w, "spec.json")
    if os.path.exists(spec_marker):
        prev = json.load(open(spec_marker)).get("spec")
        if prev != spec:
            ap.error(f"work_dir {w} holds artifacts built for spec "
                     f"{prev!r} but the current spec is {spec!r}; use a "
                     "fresh --work_dir (val bin + pretrain are "
                     "spec-dependent)")
    else:
        with open(spec_marker, "w") as f:
            json.dump({"spec": spec}, f)

    # the synthetic veri split's gids are 0..veri_ids-1 — the same identity
    # range the FL clients own (data/synthetic.py:329).  A veri draw smaller
    # than clients*ids_per_client leaves the tail clients with no veri
    # presence: their personalized 1:1/1:n tables silently degenerate to
    # TPR=FPR (observed live 2026-08-20 at veri_ids=1000/4000 FL ids).
    n_fl_ids = int(spec_val(spec, "clients")) * int(
        spec_val(spec, "ids_per_client"))
    v_ids = int(spec_val(spec, "veri_ids"))
    if v_ids < n_fl_ids:
        ap.error(f"spec veri_ids={v_ids} < clients*ids_per_client="
                 f"{n_fl_ids}: clients owning gids >= {v_ids} would have "
                 "no verification presence and degenerate local TPR tables; "
                 "set veri_ids={0} (reduce veri_imgs to bound eval cost "
                 "instead)".format(n_fl_ids))

    if args.hn_threshold <= 0.5 and ("expr=" in spec or "noise=" in spec):
        print(f"WARNING: --hn_threshold {args.hn_threshold} with a hardened "
              f"universe spec ({spec}): the real-MS1M-tuned 0.4 saturates "
              "mining on compacted synthetic geometry (every client mines "
              "the full public set, ~15x round balloon).  Calibrate with "
              "experiments/hn_probe.py (expr=0.6,noise=25 -> 0.71).",
              flush=True)

    summary = {"spec": spec, "rounds": args.rounds}

    if not (args.skip_pretrain and os.path.exists(
            os.path.join(pre, "fc.pth"))) and not args.resume:
        # --scan_blocks: the unrolled sphere64 pretrain program remote-
        # compiles for 15+ min on a core-starved host (observed 2026-08-20,
        # 1-CPU rig) — long enough to trip the silence watchdog before the
        # first step ever logs; the scan-rolled program compiles ~5x faster
        # (CLAUDE.md) and train.py already consumes the scan param layout.
        # Stalls RETRY with pretrain.py --resume (epoch granularity, incl.
        # momentum) instead of killing the whole harness.
        pre_cmd = [sys.executable, "pretrain.py", "--data_dir", spec,
                   "--output_dir", pre, "--network", args.network,
                   "--embedding_size", str(args.embedding_size),
                   "--batch_size", "512" if not args.quick else "64",
                   "--num_epoch", str(args.pretrain_epochs),
                   "--lr", "0.001", "--lr_steps", "", "--scan_blocks"]
        # pretrain gets its own SHORT stall timeout: the 1800 s floor exists
        # for train.py's ~20-min round-checkpoint fetch window (CLAUDE.md);
        # pretrain's worst legitimate silence is the scan-rolled remote
        # compile (~42 s) plus the cold-tunnel first-fetch penalty (~205 s).
        # The liveness gate additionally demands the FIRST throughput line
        # (step 50 at b512) within 10 min of launch — the round-4 ref20 loss
        # mode printed banners forever and never reached step 1.
        pre_stall = min(args.stall_timeout, 600) if args.stall_timeout else None
        t_pre, pre_tries, pre_fast_fails = time.time(), 0, 0
        while True:
            attempt_t0 = time.time()
            try:
                run(pre_cmd, stall_timeout=pre_stall,
                    liveness=(r"samples/sec", 600.0))
                break
            except RuntimeError as e:  # Stall subclasses RuntimeError
                # mirror the train.py loop: transient non-stall exits
                # (tunnel connection refused, early OOM kill, a corrupt
                # resume artifact) retry with --resume; two consecutive
                # fast (<60 s) non-stall failures mean a deterministic
                # error not worth re-paying startup for
                if not isinstance(e, Stall) and time.time() - attempt_t0 < 60:
                    pre_fast_fails += 1
                    if pre_fast_fails >= 2:
                        raise
                else:
                    pre_fast_fails = 0
                pre_tries += 1
                if pre_tries > args.max_restarts:
                    raise
                print(f"! pretrain attempt {pre_tries} failed ({e}); "
                      "relaunching with --resume", flush=True)
                if "--resume" not in pre_cmd:
                    pre_cmd.append("--resume")
        summary["pretrain_s"] = round(time.time() - t_pre, 1)

    bin_path = os.path.join(val_dir, "agedb_30.bin")
    if not os.path.exists(bin_path):
        # in a SUBPROCESS: device generation attaches the accelerator, and a
        # parent that keeps a live TPU client while train.py runs contends
        # the single tunneled device into multi-minute stalls (CLAUDE.md)
        code = ("import sys; sys.path.insert(0, %r); "
                "from experiments.fullscale_tpu import make_synth_bin; "
                "make_synth_bin(%r, %r, n_pairs=%d, image_size=112)" % (
                    REPO, bin_path, spec, 1000 if not args.quick else 64))
        # same watchdog as the train/pretrain phases: generation runs device
        # work, and a wedged tunnel call here would hang the harness before
        # train.py ever starts.  Stalls retry (the write is atomic, a killed
        # attempt leaves no partial .bin); rc!=0 raises immediately.
        for attempt in range(args.max_restarts + 1):
            if os.path.exists(bin_path):  # a killed attempt may have landed
                break
            try:
                run([sys.executable, "-c", code],
                    stall_timeout=args.stall_timeout or None)
                break
            except Stall:
                if attempt == args.max_restarts:
                    raise
                print("! synth-bin generation stalled; retrying", flush=True)

    # run.sh flag surface + the at-scale runtime knobs (device-resident
    # client states, client artifacts off, round state for resume)
    cmd = [sys.executable, "train.py",
           "--pretrained_root", pre, "--network", args.network,
           "--output_dir", run_dir, "--loss", "CosFace",
           "--batch_size", "64",
           "--num_client", spec_val(spec, "clients"),
           "--num_ids", str(int(spec_val(spec, "clients"))
                            * int(spec_val(spec, "ids_per_client"))),
           "--client_sampled_ratio", "1.0", "--lr", "0.001",
           "--total_round", str(args.rounds),
           "--local_epoch", str(args.local_epoch), "--fedface",
           "--add_pretrained_data", "--combine_dataset", "--contrastive_bb",
           "--return_all", "--BCE_local", "--adaptive_local_epoch",
           "--embedding_size", str(args.embedding_size),
           "--rec_root", spec, "--local_rec", "synth",
           "--val_root", val_dir,
           "--device_cache", "--client_ckpt_every", "0",
           "--round_ckpt_every", str(args.round_ckpt_every),
           "--round_ckpt_keep", "2",
           "--HN_threshold", str(args.hn_threshold),
           "--HN_cap", str(args.hn_cap),
           "--scan_blocks"]
    if args.resume:
        cmd.append("--resume")
    if args.cache_contrastive:
        cmd.append("--cache_contrastive")
    if args.ckpt_async:
        cmd.append("--round_ckpt_async")
    if args.ckpt_bg_fetch:
        cmd.append("--round_ckpt_bg_fetch")
    if args.lockstep > 1:
        cmd += ["--lockstep", str(args.lockstep)]
    # watchdog + auto-resume: a wedged tunnel call or a crash loses at most
    # the in-progress round (round checkpoints are the restart points;
    # restore() with no checkpoint starts round 0, so --resume is always
    # safe to append)
    t0, restarts, fast_fails = time.time(), 0, 0
    while True:
        attempt_t0 = time.time()
        try:
            run(cmd, stall_timeout=args.stall_timeout or None)
            break
        except RuntimeError as e:  # Stall subclasses RuntimeError
            # TWO consecutive non-stall exits within the first minute mean a
            # deterministic failure (bad flag, corrupt checkpoint) —
            # relaunching would just pay the remote-compile startup to fail
            # identically.  A single fast failure still retries: transient
            # launch-time errors (tunnel connection refused, early OOM kill)
            # recover fine under --resume.
            if not isinstance(e, Stall) and time.time() - attempt_t0 < 60.0:
                fast_fails += 1
                if fast_fails >= 2:
                    raise
            else:
                fast_fails = 0
            restarts += 1
            if restarts > args.max_restarts:
                raise
            print(f"! train.py attempt {restarts} failed ({e}); "
                  "relaunching with --resume", flush=True)
            if "--resume" not in cmd:
                cmd.append("--resume")
            # disarm the background checkpoint fetch after the first
            # restart: it shares the tunnel with training dispatches, so if
            # an unforeseen concurrency interaction wedged or degraded the
            # run, recovery must not re-enter it (the flag only saves the
            # ~7 min/round fetch — never worth a restart loop)
            if "--round_ckpt_bg_fetch" in cmd:
                cmd.remove("--round_ckpt_bg_fetch")
                print("! disarmed --round_ckpt_bg_fetch for the relaunch",
                      flush=True)
    summary["train_total_s"] = round(time.time() - t0, 1)
    summary["train_restarts"] = restarts

    stamps, phases, mem, mined, losses = parse_training_log(
        os.path.join(run_dir, "training.log"))
    summary["round_stamps"] = stamps
    summary.update(phases)  # already per-round deltas
    summary["memory_mb"] = mem
    if mined:
        summary["mined_imgs_per_client"] = {
            "min": int(np.min(mined)), "mean": int(np.mean(mined)),
            "max": int(np.max(mined))}
    summary["avg_client_loss"] = losses
    print(json.dumps(summary, indent=2))
    with open(os.path.join(w, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


def spec_val(spec: str, key: str) -> str:
    from fedfr_tpu.data.synthetic import parse_synth_spec

    return str(parse_synth_spec(spec)[key])


if __name__ == "__main__":
    main()
