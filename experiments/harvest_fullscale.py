"""Summarize a reference-scale fullscale_tpu.py run from its training.log.

Works mid-run (round 1 partially complete) or post-run; complements the
harness's end-of-run summary.json by deriving the per-client and per-epoch
distributions the DESIGN.md writeup quotes:

    python experiments/harvest_fullscale.py /tmp/fullscale/run/training.log
"""

import json
import re
import sys
from datetime import datetime

import numpy as np

STAMP = "%Y-%m-%d %H:%M:%S"


def ts(s):
    return datetime.strptime(s, STAMP).timestamp()


def main(path):
    text = open(path).read()
    out = {}

    rounds = [(m.group(1), int(m.group(2))) for m in re.finditer(
        r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*====== Round (\d+) ======",
        text)]
    done = re.search(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*training done",
                     text)
    bounds = [ts(s) for s, _ in rounds] + ([ts(done.group(1))] if done else [])
    out["round_wall_s"] = [round(b - a, 1)
                           for a, b in zip(bounds, bounds[1:])]

    # per-client wall clock: "round R [i/N] client C training" stamps
    starts = [(ts(m.group(1)), int(m.group(2)), int(m.group(4))) for m in
              re.finditer(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*round (\d+) "
                          r"\[(\d+)/(\d+)\] client (\d+) training", text)]
    per_round = {}
    for (t0, r, n), (t1, _, _) in zip(starts, starts[1:]):
        per_round.setdefault(r, []).append(t1 - t0)
    out["client_wall_s"] = {
        r: {"n": len(v), "mean": round(float(np.mean(v)), 1),
            "min": round(float(np.min(v)), 1),
            "max": round(float(np.max(v)), 1)}
        for r, v in per_round.items()}

    # cumulative phase spans -> per-round deltas
    phases = {}
    for m in re.finditer(r"span (phase/\S+)\s+total\s+([0-9.]+)s", text):
        phases.setdefault(m.group(1), []).append(float(m.group(2)))
    for name, vals in phases.items():
        out[name] = [round(b - a, 1) for a, b in zip([0.0] + vals[:-1], vals)]

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
