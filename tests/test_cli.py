"""End-to-end CLI tests: dataset generation -> training -> eval -> resume."""

import argparse
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fedfr_tpu.data import codec, write_split
from fedfr_tpu.data.datasets import FaceRecordDataset

IMG = 24
NUM_IDS = 8
NUM_CLIENTS = 2
IMGS_PER_ID = 10
TEST_IMGS = 4


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    """Synthetic source rec -> split_FL + split_pretrain -> data root."""
    root = tmp_path_factory.mktemp("pipeline")
    src = root / "source"
    src.mkdir()
    rng = np.random.default_rng(0)
    payloads, labels = [], []
    # FL-eligible IDs need IMGS_PER_ID imgs; generate 3x ids so both halves
    # of the shuffle contain candidates
    total_ids = NUM_IDS * 3
    for pid in range(total_ids):
        base = rng.integers(0, 200, size=(IMG, IMG, 3))
        for _ in range(IMGS_PER_ID):
            img = np.clip(base + rng.integers(-20, 20, (IMG, IMG, 3)), 0, 255)
            payloads.append(codec.encode_raw(img.astype(np.uint8)))
            labels.append(pid)
    write_split(str(src / "train.idx"), str(src / "train.rec"),
                payloads, labels, num_classes=total_ids)

    out = root / "ms1m_split"
    from tests.helpers import run_split_clis

    run_split_clis(src, out, num_client=NUM_CLIENTS, num_id=NUM_IDS,
                   imgs_per_id=IMGS_PER_ID, test_imgs=TEST_IMGS, pub_ids=4)

    # rename pretrain dir to the expected 6000 suffix layout
    gen = out / "split_pretrain_4"
    target = out / "split_pretrain_6000"
    gen.rename(target)

    # synthetic .bin verification set from the veri split
    veri = FaceRecordDataset(str(out / f"local_veri_{NUM_IDS}"), prefix="test")
    bins, issame = [], []
    lbls = veri.all_labels()
    for i in range(0, 16, 2):
        # same pair
        bins.append(veri.reader.read_idx(int(veri.imgidx[i]))[1])
        bins.append(veri.reader.read_idx(int(veri.imgidx[i + 1]))[1])
        issame.append(bool(lbls[i] == lbls[i + 1]))
        # cross pair
        j = (i + TEST_IMGS) % len(veri)
        bins.append(veri.reader.read_idx(int(veri.imgidx[i]))[1])
        bins.append(veri.reader.read_idx(int(veri.imgidx[j]))[1])
        issame.append(bool(lbls[i] == lbls[j]))
    val = root / "val"
    val.mkdir()
    with open(val / "agedb_30.bin", "wb") as f:
        pickle.dump((bins, issame), f)
    return str(root)


def test_split_outputs(pipeline_root):
    out = os.path.join(pipeline_root, "ms1m_split")
    veri = FaceRecordDataset(os.path.join(out, f"local_veri_{NUM_IDS}"), prefix="test")
    assert len(veri) == NUM_IDS * TEST_IMGS
    assert veri.num_classes == NUM_IDS
    gal = FaceRecordDataset(os.path.join(out, f"local_gallery_{NUM_IDS}"), prefix="test")
    assert len(gal) == NUM_IDS * (IMGS_PER_ID - TEST_IMGS)
    c1 = FaceRecordDataset(os.path.join(
        out, "split_train_i%04dc%04d" % (NUM_IDS, NUM_CLIENTS), "client_0001"))
    assert c1.id_base == NUM_IDS // NUM_CLIENTS
    assert c1.num_classes == NUM_IDS // NUM_CLIENTS
    # idx_id_pair metadata written
    assert os.path.exists(os.path.join(out, f"local_veri_{NUM_IDS}", "idx_id_pair.txt"))
    pub = FaceRecordDataset(os.path.join(out, "split_pretrain_6000", "client_0000"))
    assert pub.num_classes == 4


def _train_args(pipeline_root, tmp, total_round=1, resume=False):
    out = os.path.join(pipeline_root, "ms1m_split")
    return argparse.Namespace(
        network="toy", loss="CosFace", output_dir=str(tmp),
        batch_size=8, local_epoch=1, total_round=total_round,
        num_client=NUM_CLIENTS, num_ids=NUM_IDS, client_sampled_ratio=1.0,
        pretrained_root="", lr=0.01, aggr_alg="FedAvg", spreadout=True,
        init_fc=True, add_pretrained_data=True, contrastive_bb=True,
        return_all=True, combine_dataset=True, BCE_local=True, BCE_detach=False,
        adaptive_local_epoch=True, reweight_cosface=False,
        hn_strategy="feature", HN_threshold=0.4,
        rec_root=out, val_root=os.path.join(pipeline_root, "val"),
        local_rec=os.path.join(out, f"local_veri_{NUM_IDS}"),
        val_targets="agedb_30", num_workers=2, seed=100,
        embedding_size=16, image_size=IMG, resume=resume, profile=False, scan_blocks=False,
        com_batch_size=8, public_batch_size=16, eval_batch_size=16)


@pytest.fixture(scope="module")
def trained_run(pipeline_root, tmp_path_factory):
    """One-round trained output dir, shared by the CLI consumers below
    (training the toy pipeline costs ~20 s; no test mutates the dir)."""
    import train as train_cli

    outdir = tmp_path_factory.mktemp("trained") / "run"
    train_cli.main(_train_args(pipeline_root, outdir, total_round=1))
    return str(outdir)


def test_train_cli_end_to_end(pipeline_root, trained_run):
    import train as train_cli

    # config plumbing sanity
    args = _train_args(pipeline_root, trained_run, total_round=1)
    cfg = train_cli.build_config(args)
    assert cfg.model.network == "toy"
    assert cfg.data.combined_batch_size == 8

    out = trained_run
    assert os.path.exists(os.path.join(out, "training.log"))
    # source snapshot for provenance (reference train.py:50-51)
    assert os.path.exists(os.path.join(out, "code", "train.py"))
    assert os.path.exists(os.path.join(out, "code", "fedfr_tpu",
                                       "federated", "server.py"))
    assert os.path.exists(os.path.join(out, "rounds", "round_1.meta.json"))
    # per-round + client checkpoints (toy -> native npz)
    assert os.path.exists(os.path.join(out, "backbone_0.npz"))
    assert os.path.exists(os.path.join(out, "clients", "client_0", "backbone.npz"))
    # local candidates produced local_log.txt entries
    found = False
    for c in range(NUM_CLIENTS):
        p = os.path.join(out, "clients", f"client_{c}", "local_log.txt")
        if os.path.exists(p):
            content = open(p).read()
            assert "TPR (-1 to -6)" in content
            found = True
    assert found


def test_train_cli_plain_parallel(pipeline_root, tmp_path):
    """Plain objective (no --add_pretrained_data) through the CLI trains
    client-parallel over the virtual mesh instead of serializing
    (reference Client.train, client.py:511-571)."""
    import train as train_cli

    outdir = tmp_path / "plainrun"
    args = _train_args(pipeline_root, outdir, total_round=1)
    args.add_pretrained_data = False
    args.contrastive_bb = False
    args.BCE_local = False
    args.return_all = False
    args.init_fc = False
    args.spreadout = False
    train_cli.main(args)
    log = open(os.path.join(outdir, "training.log")).read()
    assert "client-parallel training over" in log
    assert "(parallel plain) avg client loss" in log
    assert os.path.exists(os.path.join(outdir, "rounds", "round_1.meta.json"))


def test_train_cli_resume(pipeline_root, tmp_path):
    import train as train_cli

    outdir = tmp_path / "run2"
    train_cli.main(_train_args(pipeline_root, outdir, total_round=1))
    # resume and continue to round 2
    train_cli.main(_train_args(pipeline_root, outdir, total_round=2,
                               resume=True))
    assert os.path.exists(os.path.join(outdir, "rounds", "round_2.meta.json"))
    # resume fidelity: the round meta carries the client-sampling rng state
    # and the best-accuracy table, so a resumed run cannot repeat fresh-run
    # sampling draws or let its first round clobber the saved best model
    import json

    meta = json.load(open(os.path.join(outdir, "rounds", "round_2.meta.json")))
    assert "rng_state" in meta and meta["rng_state"]["bit_generator"]
    assert "extra" in meta and "best" in meta["extra"]


def test_train_cli_bg_fetch_checkpoint_equivalence(pipeline_root, tmp_path):
    """--round_ckpt_bg_fetch moves the checkpoint device-fetch into the
    writer thread: round 1's state is fetched WHILE round 2 trains and
    replaces the live arrays.  The snapshot semantics must make the saved
    bytes identical to a synchronous-save run of the same seed."""
    import train as train_cli

    sync_dir = tmp_path / "sync"
    bg_dir = tmp_path / "bg"
    train_cli.main(_train_args(pipeline_root, sync_dir, total_round=2))
    a = _train_args(pipeline_root, bg_dir, total_round=2)
    a.round_ckpt_bg_fetch = True
    train_cli.main(a)

    for rnd in (1, 2):
        s = np.load(os.path.join(sync_dir, "rounds", f"round_{rnd}.npz"))
        b = np.load(os.path.join(bg_dir, "rounds", f"round_{rnd}.npz"))
        assert sorted(s.files) == sorted(b.files)
        for k in s.files:
            np.testing.assert_array_equal(s[k], b[k], err_msg=f"r{rnd}:{k}")


def test_train_cli_resume_cached_contrastive(pipeline_root, tmp_path):
    """The stall watchdog's recovery path (experiments/fullscale_tpu.py): a
    FRESH process resumes a --cache_contrastive run from its round
    checkpoint and continues the schedule.  The frozen-MOON cache is a
    per-(client, round) artifact rebuilt inside each round, so resume needs
    no cache state — the resumed round must still log its own
    phase/contrastive_cache span."""
    import train as train_cli

    outdir = tmp_path / "run_cc"
    a1 = _train_args(pipeline_root, outdir, total_round=1)
    a1.cache_contrastive = True
    train_cli.main(a1)
    span_count = open(os.path.join(outdir, "training.log")).read().count(
        "phase/contrastive_cache")
    assert span_count > 0

    a2 = _train_args(pipeline_root, outdir, total_round=2, resume=True)
    a2.cache_contrastive = True
    train_cli.main(a2)
    log = open(os.path.join(outdir, "training.log")).read()
    assert "resumed at round 1" in log
    assert log.count("phase/contrastive_cache") > span_count
    assert os.path.exists(os.path.join(outdir, "rounds", "round_2.meta.json"))


def test_local_all_cli(pipeline_root, trained_run, tmp_path):
    """Post-hoc personalized 1:1 + 1:n over trained client checkpoints."""
    outdir = trained_run
    out = os.path.join(pipeline_root, "ms1m_split")
    ids_per_client = NUM_IDS // NUM_CLIENTS

    # local_all expects 4000-id conventions; run its core helpers instead on
    # tiny data through the same code paths
    from fedfr_tpu.evalsuite.local_eval import (
        client_query_mask, local_11_roc, open_set_identification)
    from fedfr_tpu.federated.embed import class_mean_features, embed_dataset, make_embed_fn
    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.utils.checkpoint import load_native

    backbone = build_backbone("toy", 16)
    embed_fn = make_embed_fn(backbone)
    veri = FaceRecordDataset(os.path.join(out, f"local_veri_{NUM_IDS}"), prefix="test")
    variables = load_native(os.path.join(str(outdir), "clients", "client_0",
                                         "backbone.npz"))
    feats, labels = embed_dataset(embed_fn, variables, veri, 16)
    table = local_11_roc(feats, labels, 0, ids_per_client, epoch=0,
                         output_dir=str(tmp_path / "loc"))
    assert len(table) == 6

    gal = FaceRecordDataset(os.path.join(out, f"local_gallery_{NUM_IDS}"), prefix="test")
    gfeats, glabels = embed_dataset(embed_fn, variables, gal, 16)
    cg = class_mean_features(gfeats, glabels, NUM_IDS)[:ids_per_client]
    mask = client_query_mask(labels, 0, ids_per_client)
    res, fars = open_set_identification(feats.copy(), cg, mask, fars=[0.1, 0.5],
                                        recall_denominator=TEST_IMGS * ids_per_client)
    assert len(res) == 2


def test_local_all_cli_multidevice(pipeline_root, trained_run, tmp_path):
    """Drive the REAL local_all.py main() end-to-end on the 8-device mesh:
    embedding goes through make_sharded_embed_fn and the 1:1 ROC through
    pairwise_roc_histogram_sharded (production multi-device wiring —
    replaces reference roc_cuda.py:89-108 fan-out)."""
    import jax

    import local_all

    assert jax.device_count() >= 8  # conftest virtual mesh

    outdir = tmp_path / "run_md"
    import shutil

    shutil.copytree(trained_run, outdir)  # local_all appends to its logs

    out = os.path.join(pipeline_root, "ms1m_split")
    ns = argparse.Namespace(
        backbone="multi", task="1:1", ckpt_path=str(outdir),
        data_dir=os.path.join(out, f"local_veri_{NUM_IDS}"),
        gallery_data_dir=os.path.join(out, f"local_gallery_{NUM_IDS}"),
        epoch=-1, num_client=NUM_CLIENTS, num_ids=NUM_IDS,
        embedding_size=16, network="toy", gpu=None, fp16=False,
        batch_size=16, fp32=False)
    local_all.main(ns)
    log = open(os.path.join(str(outdir), "local_log.txt")).read()
    assert "Mean (-6 to -1):" in log
    assert "TPR (-1 to -6)" in log

    ns.task = "1:n"
    local_all.main(ns)
    log = open(os.path.join(str(outdir), "local_log.txt")).read()
    assert "1:n at Epoch : -1" in log

    # single-backbone variant over a per-round global checkpoint
    ns.task = "1:1"
    ns.backbone = "single"
    ns.epoch = 0
    local_all.main(ns)


def test_auto_embed_matches_plain(pipeline_root):
    """auto_embed_fn (sharded, 8 devices) == make_embed_fn (single device),
    including an odd batch size that forces internal padding."""
    import jax
    import jax.numpy as jnp

    from fedfr_tpu.federated.embed import auto_embed_fn, make_embed_fn
    from fedfr_tpu.models import build_backbone

    assert jax.device_count() >= 8
    backbone = build_backbone("toy", 16)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, IMG, IMG, 3)), train=False)
    rng = np.random.default_rng(3)
    for b in (16, 13):  # 13: not divisible by 8 -> pad + slice path
        u8 = jnp.asarray(rng.integers(0, 255, (b, IMG, IMG, 3), dtype=np.uint8))
        plain = np.asarray(make_embed_fn(backbone)(variables, u8))
        auto = np.asarray(auto_embed_fn(backbone)(variables, u8))
        assert auto.shape == (b, 16)
        np.testing.assert_allclose(auto, plain, rtol=1e-6, atol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from fedfr_tpu.utils.checkpoint import load_orbax, save_orbax

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.ones(4, np.int32)}}
    path = str(tmp_path / "ckpt")
    save_orbax(tree, path)
    back = load_orbax(path)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"]["c"], tree["b"]["c"])


def test_pretrain_then_train_chain(pipeline_root, tmp_path):
    """The reference workflow: pretrain produces backbone/fc/labels, train
    consumes them via --pretrained_root (server.py:87-124 loading paths)."""
    import pretrain as pre_cli
    import train as train_cli

    pre_out = tmp_path / "pretrain"
    pre_out.mkdir()
    pre_args = argparse.Namespace(
        data_dir=os.path.join(pipeline_root, "ms1m_split", "split_pretrain_6000",
                              "client_0000"),
        output_dir=str(pre_out), network="toy", loss="CosFace",
        embedding_size=16, image_size=IMG, batch_size=8, num_epoch=1, lr=0.05,
        lr_steps="1", scale=30.0, margin=0.4, momentum=0.9, weight_decay=5e-4,
        sample_rate=1.0, num_workers=2, log_every=2, seed=100, fp32=True,
        scan_blocks=False, resume=False)
    pre_cli.main(pre_args)
    assert os.path.exists(pre_out / "backbone.npz")
    assert os.path.exists(pre_out / "fc.pth")

    args = _train_args(pipeline_root, tmp_path / "train", total_round=1)
    args.pretrained_root = str(pre_out)
    args.init_fc = False  # use the pretrained perfect FC (server.py:119-125)
    train_cli.main(args)
    log = open(tmp_path / "train" / "training.log").read()
    assert "loaded pretrained backbone" in log
    assert "loaded pretrained perfect FC" in log
    assert "loaded pretrain labels" in log


def test_train_flag_surface_covers_reference():
    """Every flag the reference train.py declares (train.py:94-126) must be
    accepted here, so verbatim reference commands (run.sh) run unchanged."""
    import re
    import subprocess

    ref = os.environ.get("FEDFR_REFERENCE", "/root/reference")
    ref_train = os.path.join(ref, "train.py")
    if not os.path.exists(ref_train):
        pytest.skip("reference not mounted")
    ref_flags = set(re.findall(r"add_argument\('(--[\w]+)'",
                               open(ref_train).read()))
    assert ref_flags, "failed to extract reference flags"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, os.path.join(repo, "train.py"),
                          "--help"], capture_output=True, text=True,
                         timeout=120).stdout
    missing = sorted(f for f in ref_flags if f not in out)
    assert not missing, f"reference train.py flags not accepted: {missing}"


def test_train_cli_cached_contrastive_parallel(pipeline_root, tmp_path):
    """--cache_contrastive through the CLI on the (default) client-parallel
    round: the frozen-feature caches are built per group (the
    phase/contrastive_cache span appears) and the round completes."""
    import train as train_cli

    outdir = tmp_path / "ccrun"
    args = _train_args(pipeline_root, outdir, total_round=1)
    args.cache_contrastive = True
    train_cli.main(args)
    log = open(os.path.join(outdir, "training.log")).read()
    assert "client-parallel training over" in log
    assert "phase/contrastive_cache" in log
    assert "avg client loss" in log
    assert os.path.exists(os.path.join(outdir, "rounds", "round_1.meta.json"))
