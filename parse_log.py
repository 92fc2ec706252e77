"""Parse per-client TPR progressions out of local_log.txt files.

Equivalent of the reference parse_log.py: extracts each client's
TPR@{1e-5,1e-4} across epochs from the 'Epoch N, TPR (-1 to -6) = [...]'
lines and prints pretrain -> trained improvement averages.
"""

import re
import sys
from collections import defaultdict


def parse(path: str):
    acc = defaultdict(list)
    target = None
    with open(path) as f:
        for line in f:
            m = re.match(r"Target label from (\d+) to (\d+)", line)
            if m:
                target = int(m.group(1))
                continue
            m = re.match(r"Epoch (-?\d+), TPR \(-1 to -6\) = \[(.*)\]", line)
            if m and target is not None:
                vals = [float(x) for x in m.group(2).split(",")]
                acc[target].append((int(m.group(1)), vals))
    return acc


def main(path: str, epoch_index: int = -1):
    import glob
    import os

    if os.path.isdir(path):
        # a training run dir: merge every client's local_log.txt
        acc = defaultdict(list)
        for f in sorted(glob.glob(os.path.join(path, "clients", "client_*",
                                               "local_log.txt"))):
            for tid, rows in parse(f).items():
                acc[tid].extend(rows)
    else:
        acc = parse(path)
    imp5, imp4, l5, l4, p5, p4 = [], [], [], [], [], []
    for tid, rows in sorted(acc.items()):
        rows = sorted(rows)
        first = rows[0][1]
        last = rows[epoch_index][1]
        # table layout: index 4 = 1e-5, index 3 = 1e-4 (TPR listed -1..-6)
        print("ID %d: (1e-5) %.2f --> %.2f | (1e-4) %.2f --> %.2f"
              % (tid, first[4], last[4], first[3], last[3]))
        imp5.append(last[4] - first[4])
        imp4.append(last[3] - first[3])
        l5.append(last[4]); l4.append(last[3])
        p5.append(first[4]); p4.append(first[3])
    n = max(len(imp5), 1)
    print("Improved : Avg 1e-5 : %.2f,   Avg 1e-4 : %.2f"
          % (sum(imp5) / n, sum(imp4) / n))
    print("Pretrained : Avg 1e-5 : %.2f,   Avg 1e-4 : %.2f"
          % (sum(p5) / n, sum(p4) / n))
    print("Trained : Avg 1e-5 : %.2f,   Avg 1e-4 : %.2f"
          % (sum(l5) / n, sum(l4) / n))


if __name__ == "__main__":
    main(sys.argv[1])
