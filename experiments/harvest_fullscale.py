"""Summarize a reference-scale fullscale_tpu.py run from its training.log.

Works mid-run (round 1 partially complete) or post-run; complements the
harness's end-of-run summary.json by deriving the per-client and per-epoch
distributions plus the per-round trajectory table the DESIGN.md writeup
quotes:

    python experiments/harvest_fullscale.py --run_dir /tmp/fullscale20/run \
        --out experiments/fullscale20_summary.json

(a bare positional training.log path still works and prints to stdout)
"""

import argparse
import json
import os
import re
import sys
from datetime import datetime

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from logparse import phase_deltas  # noqa: E402

STAMP = "%Y-%m-%d %H:%M:%S"


def ts(s):
    return datetime.strptime(s, STAMP).timestamp()


def round_slices(text):
    """[(round, start_pos, end_pos)] — end at the next round marker or the
    owning process's end."""
    marks = [(m.start(), int(m.group(1))) for m in re.finditer(
        r"====== Round (\d+) ======", text)]
    out = []
    for (pos, r), nxt in zip(marks, [m[0] for m in marks[1:]] + [len(text)]):
        out.append((r, pos, nxt))
    return out


def harvest(path):
    text = open(path).read()
    out = {}

    # round starts and per-process "training done" markers, in log order: a
    # resumed run appends several processes to one training.log, and a
    # round's wall clock must end at its own process's done marker, not at
    # the next process's first round (hours of idle gap otherwise)
    events = sorted(
        [(m.start(), ts(m.group(1)), int(m.group(2))) for m in re.finditer(
            r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*====== Round (\d+) ======",
            text)] +
        [(m.start(), ts(m.group(1)), None) for m in re.finditer(
            r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*training done", text)])
    out["round_wall_s"] = {
        r: round(t1 - t0, 1)
        for (_, t0, r), (_, t1, _) in zip(events, events[1:])
        if r is not None}

    # per-client wall clock: "round R [i/N] client C training" stamps.
    # i == 1 resets the chain so the last client of a round never pairs with
    # the next round's first (which may start hours later in a resumed run).
    starts = [(ts(m.group(1)), int(m.group(2)), int(m.group(3))) for m in
              re.finditer(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*round (\d+) "
                          r"\[(\d+)/(\d+)\] client (\d+) training", text)]
    per_round = {}
    for (t0, r, _), (t1, r1, i1) in zip(starts, starts[1:]):
        if r1 == r and i1 != 1:
            per_round.setdefault(r, []).append(t1 - t0)
    out["client_wall_s"] = {
        r: {"n": len(v), "mean": round(float(np.mean(v)), 1),
            "min": round(float(np.min(v)), 1),
            "max": round(float(np.max(v)), 1)}
        for r, v in per_round.items()}

    # cumulative phase spans -> per-round deltas (process-banner-keyed)
    out.update(phase_deltas(text))

    mem = re.findall(
        r"device in_use (\d+) MB peak (\d+) MB \| host maxrss (\d+) MB", text)
    out["memory_mb"] = [[int(x) for x in m] for m in mem]

    mined = [int(m.group(1)) for m in
             re.finditer(r"(\d+) imgs \(\d+ IDs\) hard negative", text)]
    if mined:
        out["mined_imgs_per_client"] = {
            "n": len(mined), "mean": int(np.mean(mined)),
            "min": int(np.min(mined)), "max": int(np.max(mined))}

    sps = [float(m.group(1)) for m in
           re.finditer(r"([0-9.]+) samples/sec", text)]
    if sps:
        out["train_samples_per_sec"] = {
            "mean": round(float(np.mean(sps)), 1),
            "p10": round(float(np.percentile(sps, 10)), 1),
            "p90": round(float(np.percentile(sps, 90)), 1)}

    out["avg_client_loss"] = [float(m.group(1)) for m in re.finditer(
        r"avg client loss ([0-9.\-naif]+)", text)]
    out["agedb_acc"] = [float(m.group(1)) for m in re.finditer(
        r"Accuracy-Flip: ([0-9.]+)", text)]

    # per-round trajectory: local-epoch schedule (adaptive decay, reference
    # server.py:278-280), mined sizes, loss, accuracy — keyed to the round's
    # own log slice so resumed/partial rounds stay aligned
    rounds = {}
    for r, a, b in round_slices(text):
        seg = text[a:b]
        row = rounds.setdefault(r, {})
        eps = [int(m.group(1)) for m in
               re.finditer(r"epoch \d+/(\d+) ", seg)]
        if eps:
            row["local_epoch"] = max(eps)
        m = [int(x.group(1)) for x in
             re.finditer(r"(\d+) imgs \(\d+ IDs\) hard negative", seg)]
        if m:
            row["mined_mean"] = int(np.mean(m))
        loss = re.search(r"avg client loss ([0-9.\-naif]+)", seg)
        if loss:
            row["avg_loss"] = float(loss.group(1))
        acc = re.search(r"Accuracy-Flip: ([0-9.]+)", seg)
        if acc:
            row["agedb_acc"] = float(acc.group(1))
        if r in out["round_wall_s"]:
            row["wall_s"] = out["round_wall_s"][r]
    out["rounds"] = rounds
    return out


def trajectory_md(out):
    """DESIGN.md-ready markdown table of the per-round trajectory."""
    lines = ["| round | wall | epochs | mined/client | avg loss | agedb acc |",
             "|---|---|---|---|---|---|"]
    for r in sorted(out.get("rounds", {}), key=int):
        row = out["rounds"][r]
        wall = row.get("wall_s")
        wall = f"{wall / 60:.1f} min" if wall else "—"
        lines.append(
            f"| {r} | {wall} | {row.get('local_epoch', '—')} "
            f"| {row.get('mined_mean', '—')} "
            f"| {row.get('avg_loss', '—')} | {row.get('agedb_acc', '—')} |")
    return "\n".join(lines)


def main(argv=None):
    if isinstance(argv, str):  # legacy: main("<training.log path>")
        argv = [argv]
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", default=None,
                    help="training.log path (legacy positional)")
    ap.add_argument("--run_dir", default="",
                    help="run directory containing training.log")
    ap.add_argument("--out", default="", help="write the summary JSON here")
    ap.add_argument("--md", action="store_true",
                    help="also print the per-round trajectory as markdown")
    args = ap.parse_args(argv)
    path = args.log or (os.path.join(args.run_dir, "training.log")
                        if args.run_dir else "/tmp/fullscale/run/training.log")
    out = harvest(path)
    print(json.dumps(out, indent=2))
    if args.md:
        print(trajectory_md(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
