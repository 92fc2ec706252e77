"""Summarize a reference-scale fullscale_tpu.py run from its training.log.

Works mid-run (round 1 partially complete) or post-run; complements the
harness's end-of-run summary.json by deriving the per-client and per-epoch
distributions the DESIGN.md writeup quotes:

    python experiments/harvest_fullscale.py /tmp/fullscale/run/training.log
"""

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


def main(path):
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
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/tmp/fullscale/run/training.log")
