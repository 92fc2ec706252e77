"""Probe hard-negative mining saturation on the hardened synthetic universe.

The 20-round fullscale launch (FULLSCALE20_STATUS.md) mined the ENTIRE
420,671-image public set for client 0 at the reference threshold 0.4
("client 0: 420671 imgs (6000 IDs) hard negative @ > 0.40"), turning the
48-min cached round into ~15 h: the hardened spec (expr=0.6,noise=25)
compacts the pretrained embedding geometry, so every public image sits
within cos 0.4 of some local image.  The reference's 0.4
(/root/reference/config.py:28, used by choose_hard_negative_2
client.py:191-224) is tuned for real MS1M geometry where mining selects a
strict subset.

This probe embeds the public set + a few clients' local sets with the
run's pretrained backbone (exactly the round-0 mining inputs,
federated/client.py:142-158) and reports mined counts per candidate
threshold, so the run can pick a threshold whose mined fraction matches
the unhardened universe (~27k imgs/client mean, fullscale r3 summary).

Usage:
    python experiments/hn_probe.py --pre /tmp/fullscale20/pre \
        --spec_extra expr=0.6,noise=25 --clients 0,1,7
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fullscale_tpu import FULL_SPEC  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre", default="/tmp/fullscale20/pre")
    ap.add_argument("--spec_extra", default="expr=0.6,noise=25")
    ap.add_argument("--clients", default="0,1,7")
    ap.add_argument("--thresholds",
                    default="0.40,0.50,0.60,0.70,0.75,0.80,0.85,0.90,0.95")
    ap.add_argument("--public_batch", type=int, default=512)
    ap.add_argument("--eval_batch", type=int, default=512)
    args = ap.parse_args()

    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    from fedfr_tpu.data.synthetic import build_fl_synthetic, parse_synth_spec
    from fedfr_tpu.federated.embed import embed_dataset, max_similarity
    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.utils import torch_interop

    spec_str = FULL_SPEC + ("," + args.spec_extra if args.spec_extra else "")
    spec = parse_synth_spec(spec_str)
    universe = build_fl_synthetic(spec)
    print(f"spec: {spec_str}", flush=True)

    backbone = build_backbone("sphnet", 512, scan_blocks=True)
    sd = torch_interop.load_pth(os.path.join(args.pre, "backbone.pth"))
    variables = torch_interop.backbone_from_torch("sphnet", sd,
                                                  scan_blocks=True)
    from fedfr_tpu.federated.embed import auto_embed_fn

    embed_fn = auto_embed_fn(backbone)

    t0 = time.time()
    public_feats, _ = embed_dataset(embed_fn, variables, universe["public"],
                                    args.public_batch, l2norm=True,
                                    return_device=True)
    n_pub = universe["public"].__len__()
    print(f"public embed: {n_pub} imgs in {time.time() - t0:.1f}s", flush=True)

    thresholds = [float(t) for t in args.thresholds.split(",")]
    report = {"spec": spec_str, "n_public": int(n_pub), "clients": {}}
    for c in [int(x) for x in args.clients.split(",")]:
        ds = universe["clients"][c]
        t0 = time.time()
        local_feats, _ = embed_dataset(embed_fn, variables, ds,
                                       args.eval_batch, l2norm=True,
                                       return_device=True)
        # production mining's own max-sim helper (backend='auto': the probe
        # calibrates against the SAME kernel hard_negative_mask selects)
        ms = max_similarity(local_feats, public_feats)
        counts = {f"{t:.2f}": int((ms > t).sum()) for t in thresholds}
        qs = {f"p{q}": float(np.quantile(ms, q / 100))
              for q in (5, 25, 50, 75, 90, 93, 95, 99)}
        report["clients"][c] = {"n_local": len(ds), "mined": counts,
                                "quantiles": qs,
                                "wall_s": round(time.time() - t0, 1)}
        print(f"client {c}: local={len(ds)} mined={counts}", flush=True)
        print(f"  maxsim quantiles: {qs}", flush=True)
    print("HN_PROBE_RESULT " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
