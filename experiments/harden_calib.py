"""Calibrate the synthetic universe's difficulty knobs on the real TPU.

VERDICT r3 weak #1: the fullscale universe saturates the generic metric —
agedb-style .bin accuracy is 0.995+ from round 0, so a 20-round run proves
cost, not learning.  This experiment measures what the 20-round program's
ROUND 0 would see for candidate difficulty settings (expr / shift_div /
noise, fedfr_tpu/data/synthetic.py): it pretrains sphere64 exactly like the
fullscale harness does (2 epochs over the 420,671-image public set, the
config that produces the run's pretrain/backbone.pth), builds the same
1000-pair veri .bin, and reports the pretrained model's flip-sum pair
accuracy.  Target: ~0.8 (non-saturated, with trained headroom below the
expr-induced ceiling).

Each phase runs in its own subprocess so no two live PJRT clients contend
on the single tunneled chip (CLAUDE.md).

Usage:
    python experiments/harden_calib.py --work_dir /tmp/calib \
        --extras "expr=0.8,shift_div=4,noise=40" "expr=1.0,shift_div=3,noise=60"
"""

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fullscale_tpu import FULL_SPEC, run  # noqa: E402

EVAL_CODE = """
import json, sys
sys.path.insert(0, {repo!r})
from fedfr_tpu.utils.runtime import apply_platform_override
apply_platform_override()
from fedfr_tpu.models import build_backbone
from fedfr_tpu.federated.embed import auto_embed_fn
from fedfr_tpu.evalsuite.verification import load_bin, test_bin
from fedfr_tpu.utils import torch_interop

backbone = build_backbone("sphnet", 512, scan_blocks=True)
import os
if os.path.exists({pre!r} + "/backbone.pth"):
    sd = torch_interop.load_pth({pre!r} + "/backbone.pth")
    variables = torch_interop.backbone_from_torch("sphnet", sd,
                                                  scan_blocks=True)
else:
    from fedfr_tpu.utils.checkpoint import load_native
    variables = load_native({pre!r} + "/backbone.npz")
data, issame = load_bin({bin_path!r})
acc, std, xnorm, _, _ = test_bin(auto_embed_fn(backbone), variables, data,
                                 issame, batch_size=128)
print("CALIB_RESULT " + json.dumps(
    {{"acc": acc, "std": std, "xnorm": xnorm}}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/calib")
    ap.add_argument("--extras", nargs="+", required=True,
                    help="candidate spec-extra strings, e.g. "
                    "'expr=0.8,shift_div=4,noise=40'")
    ap.add_argument("--pretrain_epochs", type=int, default=2)
    ap.add_argument("--n_pairs", type=int, default=1000)
    ap.add_argument("--stall_timeout", type=float, default=1800)
    args = ap.parse_args()

    results = {}
    for extra in args.extras:
        spec = FULL_SPEC + "," + extra if extra else FULL_SPEC
        tag = extra.replace(",", "_").replace("=", "") or "base"
        w = os.path.join(args.work_dir, tag)
        pre = os.path.join(w, "pre")
        if os.path.exists(w):
            shutil.rmtree(w)
        os.makedirs(w)
        log = os.path.join(w, "calib.log")

        run([sys.executable, "pretrain.py", "--data_dir", spec,
             "--output_dir", pre, "--network", "sphnet",
             "--embedding_size", "512", "--batch_size", "512",
             "--num_epoch", str(args.pretrain_epochs),
             "--lr", "0.001", "--lr_steps", "", "--scan_blocks"],
            log_path=log, stall_timeout=args.stall_timeout)

        bin_path = os.path.join(w, "agedb_30.bin")
        code = ("import sys; sys.path.insert(0, %r); "
                "from experiments.fullscale_tpu import make_synth_bin; "
                "make_synth_bin(%r, %r, n_pairs=%d, image_size=112)" % (
                    REPO, bin_path, spec, args.n_pairs))
        run([sys.executable, "-c", code], log_path=log,
            stall_timeout=args.stall_timeout)

        run([sys.executable, "-c",
             EVAL_CODE.format(repo=REPO, pre=pre, bin_path=bin_path)],
            log_path=log, stall_timeout=args.stall_timeout)
        for line in open(log):
            if line.startswith("CALIB_RESULT "):
                results[extra] = json.loads(line.split(" ", 1)[1])
        print(f"== {extra}: {results.get(extra)}", flush=True)

    print(json.dumps(results, indent=2))
    with open(os.path.join(args.work_dir, "calib_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
