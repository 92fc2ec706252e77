"""The reference's complete post-training evaluation ritual, composed.

VERDICT r3 task #2: after `run.sh` finishes, the reference user runs
`local_all.py --backbone multi` for BOTH personalization tasks (1:1 and
1:n) over all 40 clients at the 160k-image verification multiplicity, then
`ijbc_all.py` (both jobs) on the final global checkpoint
(/root/reference/README.md:20-56, local_all.py:224-454,
ijbc_all.py:429-628).  This harness drives that exact chain — through the
REAL CLIs, as subprocesses under the tunnel-stall watchdog — against a
fullscale run directory (experiments/fullscale_tpu.py output), and
archives the mean TPR/TPIR tables plus per-phase wall clock.

Generic IJB-C inputs: real IJB-C is not mounted on this rig, so the
harness synthesizes an IJB-C-shaped benchmark AT PROTOCOL SCALE (469,375
images, 23,124 templates, 15,658,489 1:1 pairs, 3,531-subject G1/G2
gallery + 19,593 probe templates — the counts ijbc_all.py's meta files
carry) from the SAME synthetic-face generator the run trained on, using a
held-out identity range.  Images land in the alignment cache
(`IJBC_imgs.npy`) the reference pipeline itself writes and reuses
(ijbc_all.py:152-155); landmark alignment from loose crops is exercised
separately (tests/test_ijbc_pipeline.py, experiments/ijbc_scale_tpu.py).

Usage:
    python experiments/posttrain_eval_tpu.py --run_dir /tmp/fullscale20/run \
        --spec_extra expr=0.6,noise=25 --ijbc_root /tmp/fullscale20/ijbc
"""

import argparse
import glob
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fullscale_tpu import FULL_SPEC, run, spec_val  # noqa: E402

# held-out identity range for the synthetic IJB-C subjects: disjoint from
# FL gids (< clients*ids_per_client), public gids (2^20+), expr distractors
# ([2^26, 2^30)) and nuisance keys (2^30+)
IJBC_GID_OFFSET = 1 << 21
IJBC_DATASET_SEED = 700_001

# IJB-C 1:1 / 1:n protocol scale (the reference meta files' counts)
N_IMAGES = 469_375
N_SUBJECTS = 3_531
N_PROBE_TEMPLATES = 19_593
N_PAIRS = 15_658_489


def build_synth_ijbc_root(root: str, spec: str, *, n_subjects: int,
                          n_probe_templates: int, n_images: int,
                          n_pairs: int, seed: int = 100,
                          batch: int = 512) -> None:
    """Synthesize an IJB-C-shaped protocol root the production pipeline
    (evalsuite/ijbc.py::run_ijbc) consumes as-is.

    Layout per subject: ONE gallery template (G1/G2 alternating — the real
    protocol splits its 3,531 subjects across two galleries) and
    ~n_probe_templates/n_subjects probe templates; images spread nearly
    uniformly over templates; medias group up to 4 images inside a
    template (exercising the media-mean-then-template-sum aggregation).
    Genuine 1:1 pairs = every probe template vs its subject's gallery
    template; impostor pairs are uniform probe x other-subject gallery.
    Images are device-generated from the run's own universe spec at a
    held-out identity range and written straight into the `IJBC_imgs.npy`
    alignment cache."""
    from fedfr_tpu.data.synthetic import SyntheticFaceDataset, parse_synth_spec
    from fedfr_tpu.utils.transfer import chunked_device_get

    # the marker records WHAT was built: a reused --ijbc_root from a
    # different spec or protocol scale (e.g. an earlier --quick smoke) must
    # rebuild, not silently serve the wrong benchmark
    build_key = json.dumps({"spec": spec, "n_subjects": n_subjects,
                            "n_probe_templates": n_probe_templates,
                            "n_images": n_images, "n_pairs": n_pairs,
                            "seed": seed}, sort_keys=True)
    done_marker = os.path.join(root, ".complete")
    if os.path.exists(done_marker):
        if open(done_marker).read() == build_key:
            print(f"ijbc root {root} already built", flush=True)
            return
        print(f"ijbc root {root} was built for a different spec/scale; "
              "rebuilding", flush=True)
        import shutil

        shutil.rmtree(root)
    meta = os.path.join(root, "meta", "IJBC_meta")
    os.makedirs(meta, exist_ok=True)
    rng = np.random.default_rng(seed + 11)

    # ---- template structure
    n_templates = n_subjects + n_probe_templates
    t_subject = np.empty(n_templates, np.int64)
    t_subject[:n_subjects] = np.arange(n_subjects)          # gallery
    t_subject[n_subjects:] = np.arange(n_probe_templates) % n_subjects
    # images per template: >= 1 each, remainder spread deterministically
    per_t = np.full(n_templates, n_images // n_templates, np.int64)
    per_t[: n_images - int(per_t.sum())] += 1
    assert int(per_t.sum()) == n_images
    templates = np.repeat(np.arange(n_templates), per_t)
    subjects = t_subject[templates]
    # medias: groups of up to 4 images within a template
    pos_in_t = np.concatenate([np.arange(c) for c in per_t])
    medias = templates * 1000 + pos_in_t // 4

    # ---- meta files
    t0 = time.time()
    names = [f"img_{i}.jpg" for i in range(n_images)]
    with open(os.path.join(meta, "ijbc_face_tid_mid.txt"), "w") as f:
        f.writelines(f"{names[i]} {templates[i]} {medias[i]}\n"
                     for i in range(n_images))
    # canonical landmarks + faceness ~U(0.9, 1.0) (features are weighted by
    # these, ijbc_all.py:530-531); never aligned from loose crops here —
    # the cache npy below is the aligned-image source
    lmk = "45 60 85 60 65 80 50 100 80 100"
    faceness = rng.uniform(0.9, 1.0, n_images)
    with open(os.path.join(meta, "ijbc_name_5pts_score.txt"), "w") as f:
        f.writelines(f"{names[i]} {lmk} {faceness[i]:.4f}\n"
                     for i in range(n_images))

    import pandas as pd

    gallery_t = np.arange(n_subjects)
    probe_t = np.arange(n_subjects, n_templates)
    n_genuine = n_probe_templates
    imp_p = probe_t[rng.integers(0, n_probe_templates, n_pairs - n_genuine)]
    imp_g = rng.integers(0, n_subjects, n_pairs - n_genuine)
    # impostor: shift away from the probe's own subject (uniform over the
    # other n_subjects-1 galleries)
    own = t_subject[imp_p]
    imp_g = (own + 1 + (imp_g % (n_subjects - 1))) % n_subjects
    p1 = np.concatenate([probe_t, imp_p])
    p2 = np.concatenate([t_subject[probe_t], imp_g])  # gallery tid == subject
    label = np.zeros(n_pairs, np.int64)
    label[:n_genuine] = 1
    pd.DataFrame({"a": p1, "b": p2, "c": label}).to_csv(
        os.path.join(meta, "ijbc_template_pair_label.txt"),
        sep=" ", header=False, index=False)
    for name, rows in (("G1", gallery_t[0::2]), ("G2", gallery_t[1::2])):
        pd.DataFrame({"TEMPLATE_ID": rows,
                      "SUBJECT_ID": t_subject[rows]}).to_csv(
            os.path.join(meta, f"ijbc_1N_gallery_{name}.csv"), index=False)
    pd.DataFrame({"TEMPLATE_ID": probe_t,
                  "SUBJECT_ID": t_subject[probe_t]}).to_csv(
        os.path.join(meta, "ijbc_1N_probe_mixed.csv"), index=False)
    print(f"meta files written in {time.time() - t0:.1f}s", flush=True)

    # ---- images: device-generated at the held-out gid range, downloaded in
    # tunnel-safe chunks into the alignment-cache npy
    sp = parse_synth_spec(spec)
    ds = SyntheticFaceDataset(
        subjects.astype(np.int32),
        (IJBC_GID_OFFSET + np.arange(n_subjects)).astype(np.int32),
        id_base=0, seed=int(sp["seed"]), dataset_seed=IJBC_DATASET_SEED,
        image_size=int(sp["image_size"]), noise=int(sp["noise"]),
        block=int(sp.get("block", 4)), expr=float(sp.get("expr", 0.0)),
        shift_div=int(sp.get("shift_div", 8)))
    size = int(sp["image_size"])
    out = np.lib.format.open_memmap(
        os.path.join(root, "IJBC_imgs.npy"), mode="w+", dtype=np.uint8,
        shape=(n_images, size, size, 3))
    t0 = time.time()
    for s in range(0, n_images, batch):
        e = min(s + batch, n_images)
        imgs, _ = ds.device_batch(np.arange(s, e))
        out[s:e] = chunked_device_get(imgs)
        if (s // batch) % 50 == 0:
            el = time.time() - t0
            print(f"ijbc imgs {e}/{n_images} ({el:.0f}s, "
                  f"{e / max(el, 1e-9):.0f} imgs/s)", flush=True)
    out.flush()
    del out
    with open(done_marker, "w") as f:
        f.write(build_key)
    print(f"images written in {time.time() - t0:.1f}s", flush=True)


def parse_local_log(text: str):
    """Structured mean tables from local_all.py's local_log.txt appends.

    1:1 (`Mean (-6 to -1):\\n[v v ...]`, local_all.py:188-193) and 1:n
    (`Far:`/`Pr :` reprs, local_all.py:200-203); the LAST occurrence of
    each wins (the file accumulates across runs/epochs)."""
    out = {}
    m11 = re.findall(r"Mean \(-6 to -1\):\s*\n\[([0-9. ]+)\]", text)
    if m11:
        out["local_11_mean_tpr_fpr_1e6_to_1e1"] = [
            float(v) for v in m11[-1].split()]
    m1n = re.findall(
        r"Far: \[([^\]]+)\]\s*\nPr : \[([^\]]+)\]", text)
    if m1n:
        fars, prs = m1n[-1]
        unq = lambda s: s.strip().strip("'\"")  # noqa: E731
        out["local_1n_tpir_at_fpir"] = {
            unq(f): float(unq(p))
            for f, p in zip(fars.split(","), prs.split(","))}
    return out


def parse_ijbc_logs(run_dir: str, target: str = "ijbc"):
    """Structured tables from the ijbc-1:1 / ijbc-1:n log.txt appends
    (evalsuite/ijbc.py:508-544, the reference's ijbc_all.py:588-627
    formats)."""
    out = {}
    p11 = os.path.join(run_dir, f"{target}-1:1", "log.txt")
    if os.path.exists(p11):
        rows = re.findall(r"\|\s*{0}-\S+\s*\|([^\n]+)\|".format(target),
                          open(p11).read())
        if rows:
            vals = [float(v) for v in rows[-1].replace("|", " ").split()]
            fprs = ["1e-06", "1e-05", "0.0001", "0.001", "0.01", "0.1"]
            out["ijbc_11_tpr_at_fpr"] = dict(zip(fprs, vals))
    p1n = os.path.join(run_dir, f"{target}-1:n", "log.txt")
    if os.path.exists(p1n):
        text = open(p1n).read()
        blocks = text.split("Epoch ")
        last = blocks[-1]
        ranks = {m.group(1): float(m.group(2)) for m in re.finditer(
            r"(top\S*|rank\S*|\brank \d+) : ([0-9.]+)", last)}
        if not ranks:
            ranks = {m.group(1): float(m.group(2)) for m in re.finditer(
                r"^(\S+) : ([0-9.]+)$", last, re.M)}
        fpirs = {m.group(1): float(m.group(2)) for m in re.finditer(
            r"far = ([0-9.]+)  pr = ([0-9.]+)", last)}
        if ranks:
            out["ijbc_1n_rank"] = ranks
        if fpirs:
            out["ijbc_1n_tpir_at_fpir"] = fpirs
    return out


def newest_backbone(run_dir: str):
    """(path, round) of the newest per-round global checkpoint."""
    cands = []
    for p in glob.glob(os.path.join(run_dir, "backbone_*.pth")) + \
            glob.glob(os.path.join(run_dir, "backbone_*.npz")):
        m = re.search(r"backbone_(\d+)\.(pth|npz)$", p)
        if m:
            cands.append((int(m.group(1)), p))
    if not cands:
        raise FileNotFoundError(f"no backbone_N checkpoint in {run_dir}")
    r, p = max(cands)
    return p, r


def main():
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", default="/tmp/fullscale20/run")
    ap.add_argument("--ijbc_root", default="/tmp/fullscale20/ijbc")
    ap.add_argument("--spec_extra", default="expr=0.6,noise=25")
    ap.add_argument("--spec", default="",
                    help="full synth spec override (default: the fullscale "
                    "workload spec + --spec_extra); must match the spec the "
                    "run_dir was trained on")
    ap.add_argument("--network", default="sphnet")
    ap.add_argument("--embedding_size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--quick", action="store_true",
                    help="miniature protocol (smoke only)")
    ap.add_argument("--skip_ijbc", action="store_true")
    ap.add_argument("--skip_local", action="store_true")
    ap.add_argument("--stall_timeout", type=float, default=1800)
    ap.add_argument("--out", default="experiments/posttrain_summary.json")
    args = ap.parse_args()

    # the training harness records the universe the run_dir was actually
    # trained on (<work_dir>/spec.json, experiments/fullscale_tpu.py) —
    # evaluating against any OTHER spec silently scores the checkpoints on
    # the wrong synthetic universe, so the marker is authoritative
    marker = os.path.join(os.path.dirname(os.path.abspath(args.run_dir)),
                          "spec.json")
    trained = (json.load(open(marker)).get("spec")
               if os.path.exists(marker) else None)
    spec = args.spec or trained or (
        FULL_SPEC + ("," + args.spec_extra if args.spec_extra else ""))
    if trained is not None and not args.spec and args.spec_extra and \
            FULL_SPEC + "," + args.spec_extra != trained:
        print(f"note: --spec_extra overridden by the run_dir's trained spec "
              f"{trained!r}", flush=True)
    if trained is not None and spec != trained:
        raise SystemExit(
            f"--spec {spec!r} does not match the spec the run_dir was "
            f"trained on ({trained!r}, from {marker}); evaluating across "
            "universes produces garbage TPR tables")
    summary = {"run_dir": args.run_dir, "spec": spec}

    def flush_summary():
        # incremental + atomic: a deadline kill mid-chain (the posttrain
        # deadman frees the chip for the driver bench) must not lose the
        # phases that DID complete
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(summary, f, indent=2)
        os.replace(tmp, args.out)

    ckpt, rnd = newest_backbone(args.run_dir)
    summary["checkpoint"] = ckpt
    summary["round"] = rnd
    print(f"evaluating {ckpt} (round {rnd})", flush=True)

    scale = dict(n_subjects=N_SUBJECTS, n_probe_templates=N_PROBE_TEMPLATES,
                 n_images=N_IMAGES, n_pairs=N_PAIRS)
    if args.quick:
        scale = dict(n_subjects=12, n_probe_templates=36, n_images=600,
                     n_pairs=2000)

    # local personalization first: it is the FedFR headline (40 per-client
    # transformation-layer branches) and an order of magnitude cheaper than
    # the protocol-scale IJB-C build — under a session deadline, a mid-chain
    # kill must preserve the most important tables
    if not args.skip_local:
        sp_clients = int(spec_val(spec, "clients"))
        sp_ids = sp_clients * int(spec_val(spec, "ids_per_client"))
        for task in ("1:1", "1:n"):
            # epoch -1 = the FINAL per-client artifacts (backbone.npz +
            # bce_module.*, written once at training completion); the
            # round-stamped names are per-round client snapshots that
            # at-scale runs disable
            dt = run([sys.executable, "local_all.py", "--backbone", "multi",
                      "--task", task, "--ckpt_path", args.run_dir,
                      "--data_dir", spec, "--epoch", "-1",
                      "--num_client", str(sp_clients),
                      "--num_ids", str(sp_ids),
                      "--network", args.network,
                      "--embedding_size", str(args.embedding_size),
                      "--batch_size", "512"],
                     stall_timeout=args.stall_timeout or None)
            summary[f"local_{task}_s"] = round(dt, 1)
            log = os.path.join(args.run_dir, "local_log.txt")
            if os.path.exists(log):
                text = open(log).read()
                summary["local_log_tail"] = text[-4000:]
                summary.update(parse_local_log(text))
            flush_summary()

    if not args.skip_ijbc:
        # build in a subprocess: device generation attaches the TPU, and a
        # parent holding a live client would contend with the CLI below
        code = ("import sys; sys.path.insert(0, %r); "
                "sys.path.insert(0, %r); "
                "from posttrain_eval_tpu import build_synth_ijbc_root; "
                "build_synth_ijbc_root(%r, %r, n_subjects=%d, "
                "n_probe_templates=%d, n_images=%d, n_pairs=%d)" % (
                    REPO, os.path.join(REPO, "experiments"), args.ijbc_root,
                    spec, scale["n_subjects"], scale["n_probe_templates"],
                    scale["n_images"], scale["n_pairs"]))
        dt = run([sys.executable, "-c", code],
                 stall_timeout=args.stall_timeout or None)
        summary["ijbc_build_s"] = round(dt, 1)
        flush_summary()

        dt = run([sys.executable, "ijbc_all.py",
                  "--model-prefix", ckpt, "--root-path", args.ijbc_root,
                  "--result-dir", args.run_dir, "--epoch", str(rnd),
                  "--network", args.network,
                  "--embedding_size", str(args.embedding_size),
                  "--batch-size", str(args.batch_size),
                  "--job", "both", "--use_flip_test"],
                 stall_timeout=args.stall_timeout or None)
        summary["ijbc_both_jobs_s"] = round(dt, 1)
        for job in ("1:1", "1:n"):
            log = os.path.join(args.run_dir, f"ijbc-{job}", "log.txt")
            if os.path.exists(log):
                summary[f"ijbc_{job}_log_tail"] = open(log).read()[-2000:]
        summary.update(parse_ijbc_logs(args.run_dir))
        flush_summary()

    print(json.dumps({k: v for k, v in summary.items()
                      if not k.endswith("_tail")}, indent=2))
    flush_summary()


if __name__ == "__main__":
    main()
