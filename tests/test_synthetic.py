"""Device-synthetic datasets, chunked transfers, and the device-cache round.

The synthetic data plane (fedfr_tpu/data/synthetic.py) drives the full
workload at reference multiplicities (SURVEY.md §6) without a mounted
dataset; these tests pin its contracts at miniature scale on CPU.
"""

import argparse
import os

import numpy as np
import pytest

from fedfr_tpu.data.datasets import AllClientData, BatchLoader, CombinedDataset
from fedfr_tpu.data.synthetic import (
    build_fl_synthetic,
    parse_synth_spec,
)

SPEC = ("synth:clients=3,ids_per_client=4,imgs_min=5,imgs_max=7,public_ids=6,"
        "public_imgs=40,veri_ids=12,veri_imgs=4,image_size=16")


@pytest.fixture(scope="module")
def universe():
    return build_fl_synthetic(parse_synth_spec(SPEC))


def test_spec_defaults_are_reference_scale():
    spec = parse_synth_spec("synth:")
    assert spec["clients"] == 40 and spec["ids_per_client"] == 100
    assert spec["public_imgs"] == 420671 and spec["public_ids"] == 6000
    assert spec["veri_ids"] == 4000 and spec["veri_imgs"] == 40


def test_public_split_independent_of_client_multiplicities():
    """pretrain.py builds the universe with the spec's client defaults while
    train.py may override clients/ids_per_client from the CLI; the public
    split (fc.pth row alignment) must not depend on those keys."""
    a = build_fl_synthetic(parse_synth_spec(SPEC))["public"]
    b = build_fl_synthetic(parse_synth_spec(
        SPEC.replace("clients=3", "clients=5")))["public"]
    assert np.array_equal(a.all_labels(), b.all_labels())
    assert np.array_equal(a.class_gids, b.class_gids)


def test_public_imgs_below_ids_rejected():
    with pytest.raises(ValueError, match="public_imgs"):
        build_fl_synthetic(parse_synth_spec(
            "synth:public_ids=10,public_imgs=5"))


def test_spec_flag_conflict_rejected():
    from fedfr_tpu.config import FedFRConfig

    cfg = FedFRConfig()
    cfg.data.rec_root = "synth:clients=4,ids_per_client=2"
    cfg.data.num_clients = 3  # contradicts the spec-explicit clients=4
    with pytest.raises(ValueError, match="clients"):
        AllClientData(cfg, include_public=False)


def test_universe_structure(universe):
    clients, pub, veri = universe["clients"], universe["public"], universe["veri"]
    assert len(clients) == 3
    assert [c.id_base for c in clients] == [0, 4, 8]
    for c in clients:
        assert c.num_classes == 4
        assert 4 * 5 <= len(c) <= 4 * 7
    assert len(pub) == 40 and pub.num_classes == 6
    assert len(veri) == 12 * 4 and veri.num_classes == 12
    # public per-ID counts adjusted to the exact requested total
    assert len(pub.all_labels()) == 40


def test_generation_is_deterministic(universe):
    c0 = universe["clients"][0]
    a, la = c0.device_batch(np.arange(5))
    b, lb = c0.device_batch(np.arange(5))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(la, lb)
    assert np.asarray(a).dtype == np.uint8
    assert np.asarray(a).shape == (5, 16, 16, 3)


def test_identity_coherence_across_splits(universe):
    """veri images of identity g share g's template with the train split
    (same universe), while other identities differ — the property that makes
    personalized evaluation meaningful."""

    def mean_img(ds, cls):
        pos = np.nonzero(ds.all_labels() == cls)[0]
        im, _ = ds.device_batch(pos)
        return np.asarray(im).astype(np.float64).mean(0)

    t0 = mean_img(universe["clients"][0], 0)       # global id 0
    v_same = mean_img(universe["veri"], 0)         # global id 0
    v_diff = mean_img(universe["veri"], 5)         # global id 5
    assert np.abs(t0 - v_same).mean() < np.abs(t0 - v_diff).mean()


def test_subset_preserves_identity(universe):
    pub = universe["public"]
    sub = pub.subset(np.array([3, 7, 9]))
    si, sl = sub.device_batch(np.array([1]))       # key 7
    fi, fl = pub.device_batch(np.array([6]))       # key 7 (0-based pos 6)
    assert np.array_equal(np.asarray(si)[0], np.asarray(fi)[0])
    assert sl[0] == fl[0]


def test_combined_device_batch_matches_parts(universe):
    local = universe["clients"][1]
    pub_sub = universe["public"].subset(np.array([1, 3, 5, 9]))
    comb = CombinedDataset(local, pub_sub)
    probe = np.array([0, len(local) + 1])
    ci, cl = comb.device_batch(probe)
    li, ll = local.device_batch(np.array([0]))
    pi, pl = pub_sub.device_batch(np.array([1]))
    assert np.array_equal(np.asarray(ci)[0], np.asarray(li)[0])
    assert np.array_equal(np.asarray(ci)[1], np.asarray(pi)[0])
    assert cl[0] == ll[0]
    assert cl[1] == pl[0] + comb.shift


def test_batchloader_synthetic_padding(universe):
    import jax

    c0 = universe["clients"][0]
    with BatchLoader(c0, 8, shuffle=False, drop_last=False) as bl:
        batches = list(bl.epoch())
    n = len(c0)
    assert sum(int(v.sum()) for _, _, v in batches) == n
    for imgs, labels, valid in batches:
        assert isinstance(imgs, jax.Array)          # device-resident
        assert imgs.shape == (8, 16, 16, 3)
    # the loader never created a decode pool for a synthetic dataset
    assert bl._pool is None


def test_chunked_device_get_matches_device_get():
    import jax.numpy as jnp

    from fedfr_tpu.utils.transfer import chunked_device_get

    tree = {"small": jnp.arange(7, dtype=jnp.float32),
            "big": jnp.arange(5000, dtype=jnp.float32).reshape(50, 100),
            "host": np.arange(3)}
    out = chunked_device_get(tree, chunk_bytes=256)  # forces many slices
    assert np.array_equal(out["small"], np.arange(7, dtype=np.float32))
    assert np.array_equal(out["big"],
                          np.arange(5000, dtype=np.float32).reshape(50, 100))
    assert np.array_equal(out["host"], np.arange(3))
    assert all(isinstance(v, np.ndarray) for v in out.values())


# --------------------------------------------------------------- engine


def _mini_cfg(tmp, device_cache: bool):
    from fedfr_tpu.config import FedFRConfig

    cfg = FedFRConfig()
    cfg.data.rec_root = SPEC
    cfg.data.num_clients = 3
    cfg.data.num_ids = 12
    cfg.data.image_size = 16
    cfg.data.batch_size = 8
    cfg.data.combined_batch_size = 8
    cfg.data.public_batch_size = 16
    cfg.data.eval_batch_size = 16
    cfg.data.num_workers = 2
    cfg.model.network = "toy"
    cfg.model.embedding_size = 16
    cfg.fed.total_rounds = 1
    cfg.fed.local_epochs = 1
    cfg.fed.init_fc = True
    cfg.optim.lr = 0.01
    cfg.runtime.output_dir = str(tmp)
    cfg.runtime.device_cache = device_cache
    return cfg


def test_device_cache_round_matches_host_round(tmp_path):
    """One full joint-objective round with device-resident client states is
    numerically identical to the host-round-trip path."""
    from fedfr_tpu.federated import Server

    results = []
    for dc in (False, True):
        cfg = _mini_cfg(tmp_path / f"dc{dc}", device_cache=dc)
        data = AllClientData(cfg, include_public=True)
        server = Server(cfg, data)
        server.train_round()
        results.append((server.host_federated_vars(),
                        [c.last_loss for c in server.clients],
                        [np.asarray(c.fc_local) for c in server.clients]))
    import jax

    (vars_a, losses_a, fcs_a), (vars_b, losses_b, fcs_b) = results
    for la, lb in zip(losses_a, losses_b):
        assert la == pytest.approx(lb, rel=1e-6)
    for fa, fb in zip(fcs_a, fcs_b):
        np.testing.assert_allclose(fa, fb, rtol=0, atol=1e-7)
    flat_a = jax.tree_util.tree_leaves(vars_a)
    flat_b = jax.tree_util.tree_leaves(vars_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


def test_device_cache_keeps_backbones_on_device(tmp_path):
    import jax

    from fedfr_tpu.federated import Server

    cfg = _mini_cfg(tmp_path, device_cache=True)
    data = AllClientData(cfg, include_public=True)
    server = Server(cfg, data)
    server.train_round()
    assert all(isinstance(leaf, jax.Array) for leaf in
               jax.tree_util.tree_leaves(server.federated_vars))
    c = server.clients[0]
    assert all(isinstance(leaf, jax.Array) for leaf in
               jax.tree_util.tree_leaves(c.trained_backbone))
    # heads/bookkeeping stay host-side
    assert isinstance(c.fc_local, np.ndarray)
    # phase breakdown accumulated
    assert server.timer.totals.get("phase/public_embed", 0) > 0
    assert server.timer.totals.get("phase/mining", 0) > 0
    assert server.timer.totals.get("phase/local_train", 0) > 0
    assert server.timer.totals.get("phase/aggregate", 0) > 0


def test_device_cache_keeps_backbones_on_device_parallel(tmp_path):
    """The client-parallel round honors the --device_cache contract too:
    trained backbones come back from the stacked state as device arrays
    (regression: the parallel path fetched the whole stacked tree to host,
    momentum included)."""
    import jax

    from fedfr_tpu.federated import Server
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg = _mini_cfg(tmp_path, device_cache=True)
    data = AllClientData(cfg, include_public=True)
    server = Server(cfg, data)
    n = cfg.data.num_clients
    mesh = make_mesh((n, 1, 1), devices=jax.devices()[:n])
    server.train_round_parallel(mesh)
    c = server.clients[0]
    assert all(isinstance(leaf, jax.Array) for leaf in
               jax.tree_util.tree_leaves(c.trained_backbone))
    assert isinstance(c.fc_local, np.ndarray)


def test_train_cli_synth_root(tmp_path):
    """train.py end-to-end on a synthetic universe with checkpoint gating:
    client artifacts disabled, round state saved, local eval driven from the
    universe's veri split."""
    import train as train_cli

    out = tmp_path / "run"
    args = argparse.Namespace(
        network="toy", loss="CosFace", output_dir=str(out),
        batch_size=8, local_epoch=1, total_round=1,
        num_client=3, num_ids=12, client_sampled_ratio=1.0,
        pretrained_root="", lr=0.01, aggr_alg="FedAvg", spreadout=True,
        init_fc=True, add_pretrained_data=True, contrastive_bb=True,
        return_all=True, combine_dataset=True, BCE_local=True,
        BCE_detach=False, adaptive_local_epoch=True, reweight_cosface=False,
        hn_strategy="feature", HN_threshold=0.4,
        rec_root=SPEC, val_root="", local_rec="synth",
        val_targets="", num_workers=2, seed=100,
        embedding_size=16, image_size=16, resume=False, profile=False,
        scan_blocks=False, com_batch_size=8, public_batch_size=16,
        eval_batch_size=16, device_cache=True, client_ckpt_every=0,
        round_ckpt_every=1, freeze_bn=False)
    train_cli.main(args)
    assert os.path.exists(os.path.join(out, "training.log"))
    assert os.path.exists(os.path.join(out, "rounds", "round_1.meta.json"))
    # client artifacts gated off per-round, but training COMPLETED
    # (total_round reached) so the final per-client checkpoints were written
    # once — the post-training local_all --backbone multi contract
    # (reference README.md:20-34)
    for c in range(3):
        assert os.path.exists(os.path.join(out, "clients", f"client_{c}",
                                           "backbone.npz"))
        assert any(os.path.exists(os.path.join(
            out, "clients", f"client_{c}", f"bce_module{ext}"))
            for ext in (".pth", ".npz"))
    # local verification ran against the synthetic veri split
    found = any(
        os.path.exists(os.path.join(out, "clients", f"client_{c}",
                                    "local_log.txt"))
        for c in range(3))
    assert found

    # the composed post-training eval flow in synth mode: local_all multi
    # 1:1 AND 1:n straight off the synth spec (veri = universe veri split,
    # gallery = each client's own train images)
    import local_all

    ns = argparse.Namespace(
        backbone="multi", task="1:1", ckpt_path=str(out), data_dir=SPEC,
        gallery_data_dir="", epoch=-1, num_client=3, num_ids=12,
        embedding_size=16, network="toy", gpu=None, fp16=False,
        batch_size=16, fp32=False)
    local_all.main(ns)
    log = open(os.path.join(out, "local_log.txt")).read()
    assert "Mean (-6 to -1):" in log
    ns.task = "1:n"
    local_all.main(ns)
    log = open(os.path.join(out, "local_log.txt")).read()
    assert "1:n at Epoch : -1" in log

    # spec/flag disagreement is an error, not a silent mis-evaluation
    ns.num_client = 2
    with pytest.raises(ValueError, match="clients"):
        local_all.main(ns)

    # a veri split that doesn't cover every client's ID range would produce
    # all-masked queries and silent 0.0 rows — also an error
    ns.num_client = 3
    ns.data_dir = SPEC.replace("veri_ids=12", "veri_ids=8")
    with pytest.raises(ValueError, match="veri_ids"):
        local_all.main(ns)


def test_final_client_ckpt_cadence(tmp_path):
    """The end-of-training per-client checkpoint write fires exactly when
    the per-round cadence (--client_ckpt_every N) did NOT capture the final
    round — not only when the cadence is 0 (review r4): cadence 2 over 2
    rounds saves at round 0 and must re-save at completion; cadence 1 over
    1 round already captured the final state and must not duplicate."""
    import train as train_cli

    def run(out, total_round, cce):
        args = argparse.Namespace(
            network="toy", loss="CosFace", output_dir=str(out),
            batch_size=8, local_epoch=1, total_round=total_round,
            num_client=3, num_ids=12, client_sampled_ratio=1.0,
            pretrained_root="", lr=0.01, aggr_alg="FedAvg", spreadout=False,
            init_fc=True, add_pretrained_data=True, contrastive_bb=False,
            return_all=True, combine_dataset=True, BCE_local=False,
            BCE_detach=False, adaptive_local_epoch=False,
            reweight_cosface=False, hn_strategy="feature", HN_threshold=0.4,
            rec_root=SPEC, val_root="", local_rec="",
            val_targets="", num_workers=0, seed=100,
            embedding_size=16, image_size=16, resume=False, profile=False,
            scan_blocks=False, com_batch_size=8, public_batch_size=16,
            eval_batch_size=16, device_cache=True, client_ckpt_every=cce,
            round_ckpt_every=1, freeze_bn=False)
        train_cli.main(args)
        return open(os.path.join(out, "training.log")).read()

    log = run(tmp_path / "missed", total_round=2, cce=2)
    assert "saving final per-client checkpoints" in log
    assert os.path.exists(os.path.join(tmp_path / "missed", "clients",
                                       "client_0", "backbone.npz"))
    log = run(tmp_path / "captured", total_round=1, cce=1)
    assert "saving final per-client checkpoints" not in log
    # the cadence itself wrote them
    assert os.path.exists(os.path.join(tmp_path / "captured", "clients",
                                       "client_0", "backbone.npz"))


def test_cache_contrastive_round_on_synthetic_matches_recompute(tmp_path):
    """fed.cache_contrastive over the device-synthetic data plane (the
    at-scale harness configuration: synth rec_root + device_cache) tracks
    the recompute round — covers embed_flip_caches' device-batch path and
    the position-threaded synthetic loader before any TPU-hours run it."""
    from fedfr_tpu.federated import Server

    results = []
    for cached in (False, True):
        cfg = _mini_cfg(tmp_path / f"cc{cached}", device_cache=True)
        cfg.fed.cache_contrastive = cached
        data = AllClientData(cfg, include_public=True)
        server = Server(cfg, data)
        server.train_round()
        results.append((server.host_federated_vars(),
                        [c.last_loss for c in server.clients]))
    import jax

    (vars_a, losses_a), (vars_b, losses_b) = results
    for la, lb in zip(losses_a, losses_b):
        assert la == pytest.approx(lb, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(vars_a),
                    jax.tree_util.tree_leaves(vars_b)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
