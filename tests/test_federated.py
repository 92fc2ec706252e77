"""End-to-end federated engine tests on a synthetic multi-client dataset."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fedfr_tpu.config import FedFRConfig
from fedfr_tpu.data import codec, write_split
from fedfr_tpu.data.datasets import AllClientData, FaceRecordDataset
from fedfr_tpu.federated import Server
from fedfr_tpu.federated.embed import embed_dataset, hard_negative_mask, make_embed_fn
from fedfr_tpu.models import build_backbone


NUM_CLIENTS = 3
IDS_PER_CLIENT = 3
IMG = 32


def _write_client_split(root, cid, rng, imgs_per_id=8):
    payloads, labels = [], []
    for local_id in range(IDS_PER_CLIENT):
        base = rng.integers(0, 200, size=(IMG, IMG, 3))
        for _ in range(imgs_per_id):
            img = np.clip(base + rng.integers(-20, 20, size=(IMG, IMG, 3)), 0, 255)
            payloads.append(codec.encode_raw(img.astype(np.uint8)))
            labels.append(local_id)
    os.makedirs(root, exist_ok=True)
    write_split(os.path.join(root, "train.idx"), os.path.join(root, "train.rec"),
                payloads, labels, num_classes=IDS_PER_CLIENT,
                id_base=cid * IDS_PER_CLIENT)


@pytest.fixture(scope="module")
def fl_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fl")
    rng = np.random.default_rng(7)
    split = root / ("split_train_i%04dc%04d" % (NUM_CLIENTS * IDS_PER_CLIENT, NUM_CLIENTS))
    for c in range(NUM_CLIENTS):
        _write_client_split(str(split / ("client_%04d" % c)), c, rng)
    # public set: 5 ids x 6 imgs
    pub = root / "split_pretrain_6000" / "client_0000"
    os.makedirs(pub, exist_ok=True)
    payloads, labels = [], []
    for pid in range(5):
        base = rng.integers(0, 200, size=(IMG, IMG, 3))
        for _ in range(6):
            img = np.clip(base + rng.integers(-20, 20, size=(IMG, IMG, 3)), 0, 255)
            payloads.append(codec.encode_raw(img.astype(np.uint8)))
            labels.append(pid)
    write_split(str(pub / "train.idx"), str(pub / "train.rec"),
                payloads, labels, num_classes=5)
    return str(root)


def _tiny_cfg(fl_root, **fed_overrides):
    cfg = FedFRConfig()
    cfg.data.rec_root = fl_root
    cfg.data.num_clients = NUM_CLIENTS
    cfg.data.num_ids = NUM_CLIENTS * IDS_PER_CLIENT
    cfg.data.image_size = IMG
    cfg.data.batch_size = 8
    cfg.data.combined_batch_size = 8
    cfg.data.public_batch_size = 16
    cfg.data.eval_batch_size = 16
    cfg.data.num_workers = 2
    cfg.model.network = "toy"
    cfg.model.embedding_size = 32
    cfg.fed.local_epochs = 1
    cfg.fed.total_rounds = 1
    cfg.fed.hn_threshold = -1.0  # keep all public imgs (synthetic feats are arbitrary)
    for k, v in fed_overrides.items():
        assert hasattr(cfg.fed, k), f"unknown fed config field: {k}"
        setattr(cfg.fed, k, v)
    return cfg


def test_all_client_data_loads(fl_root):
    cfg = _tiny_cfg(fl_root)
    data = AllClientData(cfg)
    assert len(data.client_datasets) == NUM_CLIENTS
    assert data.train_class_sizes == [IDS_PER_CLIENT] * NUM_CLIENTS
    assert data.client(1).id_base == IDS_PER_CLIENT
    assert data.public_dataset.num_classes == 5


def test_full_fedfr_round(fl_root):
    """One complete FedFR round: HN mining, joint branch training with BCE +
    contrastive, FedAvg over all leaves, FC FedAvg, SpreadOut."""
    cfg = _tiny_cfg(fl_root, spreadout=True, init_fc=True)
    data = AllClientData(cfg)
    server = Server(cfg, data)

    assert server.pretrained_fc.shape == (5, 32)
    before = jax.tree_util.tree_map(np.asarray, server.federated_vars)
    fc_before = server.clients[0].fc_local.copy()
    global_fc_before = server.pretrained_fc.copy()

    stats = server.train_round()
    assert np.isfinite(stats["avg_loss"])
    server.advance_round()
    assert server.global_round == 1

    after = server.federated_vars
    # global model changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # batch stats were aggregated too (present for toy backbone)
    assert "batch_stats" in after
    # client local FC trained + spreadout applied
    assert not np.allclose(server.clients[0].fc_local, fc_before)
    # global FC aggregated from clients (fedavg_on_fc, server.py)
    assert server.pretrained_fc.shape == (5, 32)
    assert not np.allclose(server.pretrained_fc, global_fc_before)


def test_plain_training_round(fl_root):
    """CosFace-only path (no public data, no BCE, no contrastive)."""
    cfg = _tiny_cfg(fl_root, add_pretrained_data=False, bce_local=False,
                    contrastive=False, return_all=False)
    data = AllClientData(cfg, include_public=False)
    server = Server(cfg, data)
    stats = server.train_round()
    assert np.isfinite(stats["avg_loss"])
    assert server.clients[0].trained_backbone is not None


def test_client_sampling_ratio(fl_root):
    cfg = _tiny_cfg(fl_root)
    cfg.fed.client_sampled_ratio = 2 / 3
    data = AllClientData(cfg)
    server = Server(cfg, data)
    sampled = server.sample_clients()
    assert len(sampled) == 2
    assert sampled == sorted(sampled)


def test_backbone_torch_interop_roundtrip():
    """Per-round backbone checkpoints are torch state_dicts loadable back
    into flax (the save path itself is exercised end-to-end by
    tests/test_cli.py::test_train_cli_resume)."""
    from fedfr_tpu.utils import torch_interop as ti

    backbone = build_backbone("sphnet20", 512, bf16=False)
    variables = jax.device_get(backbone.init(jax.random.PRNGKey(0),
                                             jnp.zeros((1, 112, 112, 3)), train=False))
    sd = ti.backbone_to_torch("sphnet20", variables)
    back = ti.backbone_from_torch("sphnet20", sd)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(back["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_backbone_torch_export_geometry_guard():
    """Non-reference input geometry cannot round-trip to a torch state_dict
    (the reference modules hardcode fc(512*7*7 -> E), sphnet.py:52) — the
    export raises NotImplementedError so save paths fall back to .npz."""
    from fedfr_tpu.utils import torch_interop as ti

    backbone = build_backbone("sphnet20", 64, bf16=False)
    variables = jax.device_get(backbone.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)), train=False))
    with pytest.raises(NotImplementedError):
        ti.backbone_to_torch("sphnet20", variables)


def test_save_round_checkpoint_npz_fallback(fl_root, tmp_path):
    """A backbone with no torch export (toy net) still produces a loadable
    per-round checkpoint via the .npz fallback."""
    from fedfr_tpu.utils.checkpoint import load_native

    cfg = _tiny_cfg(fl_root, add_pretrained_data=False, bce_local=False,
                    contrastive=False, return_all=False)
    data = AllClientData(cfg, include_public=False)
    server = Server(cfg, data)
    path = server.save_round_checkpoint(str(tmp_path))
    assert path.endswith("backbone_0.npz") and os.path.exists(path)
    loaded = load_native(path)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(server.host_federated_vars())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_client_parallel_round(fl_root):
    """Client-parallel round over the mesh client axis matches the engine's
    contract: all clients trained, aggregation applied."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg(fl_root, spreadout=True)
    data = AllClientData(cfg)
    server = Server(cfg, data)
    mesh = make_mesh((4, 2, 1))
    before = jax.tree_util.tree_map(np.asarray, server.federated_vars)
    stats = server.train_round_parallel(mesh)
    assert np.isfinite(stats["avg_loss"])
    server.advance_round()
    assert server.global_round == 1
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, server.federated_vars)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    for c in server.clients:
        assert c.trained_backbone is not None


def test_parallel_round_matches_sequential(fl_root):
    """The client-parallel round (vmapped lockstep over the mesh client axis)
    produces the SAME aggregated model as the reference-semantics sequential
    loop (server.py:283-316) on a config where the wrap-around deviation is
    inert: uniform per-client dataset sizes (equal epoch lengths), identical
    per-client loader seeds and rng keys (base key + in-step fold_in)."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg_s = _tiny_cfg(fl_root, spreadout=True)
    cfg_p = _tiny_cfg(fl_root, spreadout=True)
    server_s = Server(cfg_s, AllClientData(cfg_s))
    server_p = Server(cfg_p, AllClientData(cfg_p))

    server_s.train_round()
    mesh = make_mesh((NUM_CLIENTS, 1, 1), devices=jax.devices()[:NUM_CLIENTS])
    server_p.train_round_parallel(mesh)

    # equal combined dataset sizes -> equal epoch lengths (deviation inert)
    assert len({c.dataset_size for c in server_p.clients}) == 1

    # measured max-abs gap is ~3e-8 (one fp32 ulp): the only difference is
    # vmap-batched vs single-client kernel reduction order
    for a, b in zip(jax.tree_util.tree_leaves(server_s.federated_vars),
                    jax.tree_util.tree_leaves(server_p.federated_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(server_s.pretrained_fc, server_p.pretrained_fc,
                               rtol=1e-6, atol=1e-6)
    for cs, cp in zip(server_s.clients, server_p.clients):
        np.testing.assert_allclose(cs.fc_local, cp.fc_local,
                                   rtol=1e-6, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(cs.bce_vars),
                        jax.tree_util.tree_leaves(cp.bce_vars)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


def test_parallel_plain_round_matches_sequential(fl_root):
    """The plain-objective (CosFace-only, Client.train client.py:511-571)
    client-parallel round matches the sequential loop the same way the
    branch-objective one does — the mode the reference runs without
    --add_pretrained_data no longer serializes on a slice."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg_s = _tiny_cfg(fl_root, add_pretrained_data=False)
    cfg_p = _tiny_cfg(fl_root, add_pretrained_data=False)
    server_s = Server(cfg_s, AllClientData(cfg_s, include_public=False))
    server_p = Server(cfg_p, AllClientData(cfg_p, include_public=False))

    server_s.train_round()
    mesh = make_mesh((NUM_CLIENTS, 1, 1), devices=jax.devices()[:NUM_CLIENTS])
    server_p.train_round_parallel(mesh)

    assert len({c.dataset_size for c in server_p.clients}) == 1
    for a, b in zip(jax.tree_util.tree_leaves(server_s.federated_vars),
                    jax.tree_util.tree_leaves(server_p.federated_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    for cs, cp in zip(server_s.clients, server_p.clients):
        assert cs.last_loss == pytest.approx(cp.last_loss, rel=1e-5)
        np.testing.assert_allclose(cs.fc_local, cp.fc_local,
                                   rtol=1e-6, atol=1e-6)


def test_lockstep_single_device_matches_sequential(fl_root):
    """``fed.lockstep`` stacks several clients per client-axis slice — here
    ALL of them on a ONE-device mesh (the single-chip lockstep mode): the
    vmapped group batches every client's convs into one XLA program, and
    the round still matches the reference-semantics sequential loop."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg_s = _tiny_cfg(fl_root)
    cfg_p = _tiny_cfg(fl_root, lockstep=NUM_CLIENTS)
    server_s = Server(cfg_s, AllClientData(cfg_s))
    server_p = Server(cfg_p, AllClientData(cfg_p))

    server_s.train_round()
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    server_p.train_round_parallel(mesh)

    assert len({c.dataset_size for c in server_p.clients}) == 1
    for a, b in zip(jax.tree_util.tree_leaves(server_s.federated_vars),
                    jax.tree_util.tree_leaves(server_p.federated_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(server_s.pretrained_fc, server_p.pretrained_fc,
                               rtol=1e-6, atol=1e-6)


def test_lockstep_with_padded_group_matches_sequential(fl_root):
    """lockstep=2 over one device chunks 3 clients into groups [0,1] and
    [2,pad] — the padded-slot discard and per-group stacking stay correct
    when K exceeds the device count."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg_s = _tiny_cfg(fl_root)
    cfg_p = _tiny_cfg(fl_root, lockstep=2)
    server_s = Server(cfg_s, AllClientData(cfg_s))
    server_p = Server(cfg_p, AllClientData(cfg_p))

    server_s.train_round()
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    server_p.train_round_parallel(mesh)

    for a, b in zip(jax.tree_util.tree_leaves(server_s.federated_vars),
                    jax.tree_util.tree_leaves(server_p.federated_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    for cs, cp in zip(server_s.clients, server_p.clients):
        np.testing.assert_allclose(cs.fc_local, cp.fc_local,
                                   rtol=1e-6, atol=1e-6)


def test_oversized_lockstep_clamps_to_sampled_clients(fl_root):
    """An oversized ``--lockstep`` (K far beyond the sampled client count)
    is clamped instead of silently burning every round's excess slots on
    padded duplicate-client compute; the clamped round still matches the
    sequential loop."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg_s = _tiny_cfg(fl_root)
    cfg_p = _tiny_cfg(fl_root, lockstep=10 * NUM_CLIENTS)
    server_s = Server(cfg_s, AllClientData(cfg_s))
    server_p = Server(cfg_p, AllClientData(cfg_p))

    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    server_p.current_client_list = server_p.sample_clients()
    assert server_p._lockstep_group_size(mesh) == NUM_CLIENTS

    server_s.train_round()
    server_p.train_round_parallel(mesh)
    for a, b in zip(jax.tree_util.tree_leaves(server_s.federated_vars),
                    jax.tree_util.tree_leaves(server_p.federated_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_lockstep_multidevice_cached_contrastive_matches_sequential(fl_root):
    """lockstep=2 on a TWO-device client axis (K=4 over 3 clients) with
    fed.cache_contrastive: each device's shard now holds TWO clients'
    stacked frozen-MOON caches (the per-device concatenate branch of the
    group-cache assembly) and the padded fourth slot lands mid-shard — the
    round still matches the sequential cached round."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg_s = _tiny_cfg(fl_root, cache_contrastive=True)
    cfg_p = _tiny_cfg(fl_root, cache_contrastive=True, lockstep=2)
    server_s = Server(cfg_s, AllClientData(cfg_s))
    server_p = Server(cfg_p, AllClientData(cfg_p))

    server_s.train_round()
    mesh = make_mesh((2, 1, 1), devices=jax.devices()[:2])
    server_p.train_round_parallel(mesh)

    for a, b in zip(jax.tree_util.tree_leaves(server_s.federated_vars),
                    jax.tree_util.tree_leaves(server_p.federated_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(server_s.pretrained_fc, server_p.pretrained_fc,
                               rtol=1e-6, atol=1e-6)
    for cs, cp in zip(server_s.clients, server_p.clients):
        np.testing.assert_allclose(cs.fc_local, cp.fc_local,
                                   rtol=1e-6, atol=1e-6)


def test_parallel_plain_round_applies_adaptive_epochs(fl_root):
    """Past round 0, the plain-parallel path decays local_epoch exactly like
    the sequential loop (reference server.py:278-280)."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg(fl_root, add_pretrained_data=False,
                    adaptive_local_epoch=True)
    server = Server(cfg, AllClientData(cfg, include_public=False))
    server.local_epoch = 10
    server.global_round = 1
    mesh = make_mesh((NUM_CLIENTS, 1, 1), devices=jax.devices()[:NUM_CLIENTS])
    server.train_round_parallel(mesh)
    assert server.local_epoch == 8


def test_zero_local_epochs_is_noop(fl_root):
    """--local_epoch 0 completes as a no-op run with loss 0 (regression:
    the on-device loss accumulator left `sums` unbound)."""
    cfg = _tiny_cfg(fl_root)
    server = Server(cfg, AllClientData(cfg))
    server.local_epoch = 0
    stats = server.train_round()
    assert stats["avg_loss"] == 0.0


def test_fc_mining_selection_semantics(fl_root):
    """FC-row mining matches the reference row-selection math
    (choose_hard_negative, client.py:227-267): ids = unique columns of
    (norm(self_fc) @ norm(pretrain_fc).T > thr); surviving imgidx are the
    1-based positions of public images whose label is a selected id."""
    import torch
    import torch.nn.functional as F

    cfg = _tiny_cfg(fl_root)
    data = AllClientData(cfg)
    server = Server(cfg, data)
    client = server.clients[0]
    public_labels = data.public_dataset.all_labels()

    rng = np.random.default_rng(11)
    client.fc_local = rng.standard_normal(
        (client.num_classes, cfg.model.embedding_size)).astype(np.float32)
    pretrain_fc = rng.standard_normal(
        (5, cfg.model.embedding_size)).astype(np.float32)
    thr = 0.05

    subset = client.select_hard_negatives_fc(pretrain_fc, data.public_dataset,
                                             public_labels, threshold=thr)

    sim = torch.matmul(F.normalize(torch.from_numpy(client.fc_local)),
                       F.normalize(torch.from_numpy(pretrain_fc)).t())
    ids = torch.unique(torch.where(sim > thr)[1]).numpy()
    expect_idx = np.asarray(
        [i + 1 for i in range(len(public_labels)) if public_labels[i] in ids])
    assert len(ids) > 0  # nontrivial selection for this seed
    np.testing.assert_array_equal(np.sort(np.asarray(subset.imgidx)),
                                  np.sort(expect_idx))


def test_round_with_fc_mining(fl_root):
    """hn_strategy='fc' drives a full round end-to-end (and the server skips
    the public-feature embed that FC mining never consumes)."""
    cfg = _tiny_cfg(fl_root, hn_strategy="fc", hn_fc_threshold=-1.0)
    data = AllClientData(cfg)
    server = Server(cfg, data)
    stats = server.train_round()
    assert np.isfinite(stats["avg_loss"])
    for cid in server.current_client_list:
        assert server.clients[cid].trained_backbone is not None


def test_feature_mining_cap_keeps_hardest(fl_root):
    """fed.hn_cap bounds the mined set at the cap HARDEST public images
    (highest max cos-sim).  With hn_threshold=-1 every public image is above
    threshold, so the capped subset must be exactly the top-`cap` by score
    and uncapped runs must keep everything (reference semantics,
    client.py:191-224 has no cap)."""
    from fedfr_tpu.federated.embed import max_similarity

    cfg = _tiny_cfg(fl_root, hn_cap=3)
    data = AllClientData(cfg)
    server = Server(cfg, data)
    client = server.clients[0]
    public_labels = data.public_dataset.all_labels()
    n_pub = len(public_labels)
    assert n_pub > 3

    gvars = server.federated_vars
    feats, _ = embed_dataset(client._embed_fn, gvars,
                             data.public_dataset, cfg.data.eval_batch_size,
                             l2norm=True)
    local_feats, _ = embed_dataset(client._embed_fn, gvars,
                                   client.dataset, cfg.data.eval_batch_size,
                                   l2norm=True)
    scores = max_similarity(np.asarray(local_feats), np.asarray(feats))
    expect = np.sort(np.argsort(scores, kind="stable")[::-1][:3] + 1)

    subset = client.select_hard_negatives(gvars,
                                          data.public_dataset,
                                          np.asarray(feats), public_labels)
    np.testing.assert_array_equal(np.sort(np.asarray(subset.imgidx)), expect)

    client.cfg.fed.hn_cap = 0
    subset_all = client.select_hard_negatives(gvars,
                                              data.public_dataset,
                                              np.asarray(feats), public_labels)
    assert len(subset_all.imgidx) == n_pub


def test_hard_negative_mask_threshold():
    feats = np.eye(4, dtype=np.float32)
    public = np.concatenate([np.eye(4, dtype=np.float32),
                             -np.eye(4, dtype=np.float32)])
    mask = hard_negative_mask(feats, public, threshold=0.5, chunk=4)
    np.testing.assert_array_equal(mask, [True] * 4 + [False] * 4)


def test_max_similarity_matches_dense_oracle():
    """max_similarity (the shared mining/calibration helper) equals the
    dense per-public max over all local rows, including across chunk
    boundaries with a ragged final chunk."""
    from fedfr_tpu.federated.embed import max_similarity

    rng = np.random.default_rng(7)
    loc = rng.normal(size=(13, 16)).astype(np.float32)
    pub = rng.normal(size=(37, 16)).astype(np.float32)
    loc /= np.linalg.norm(loc, axis=1, keepdims=True)
    pub /= np.linalg.norm(pub, axis=1, keepdims=True)
    got = max_similarity(loc, pub, chunk=8, backend="xla")
    want = (pub @ loc.T).max(axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_embed_matches_plain(fl_root):
    """Data-parallel embedding over the mesh equals the single-device path."""
    from fedfr_tpu.federated.embed import make_sharded_embed_fn
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg(fl_root)
    backbone = build_backbone("toy", 32)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, IMG, IMG, 3)), train=False)
    mesh = make_mesh((1, 8, 1))
    plain = make_embed_fn(backbone)
    sharded = make_sharded_embed_fn(backbone, mesh)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (16, IMG, IMG, 3), dtype=np.uint8))
    a = np.asarray(plain(variables, u8))
    b = np.asarray(sharded(variables, u8))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fedprox_proximal_term(fl_root):
    """fedprox_mu pulls client updates toward the global model."""
    cfg = _tiny_cfg(fl_root)
    cfg.fed.fedprox_mu = 10.0  # strong (but stable: lr*mu < 1) pull
    cfg.optim.lr = 0.01
    data = AllClientData(cfg)
    server_prox = Server(cfg, data)
    stats = server_prox.train_round()
    assert np.isfinite(stats["avg_loss"])

    cfg2 = _tiny_cfg(fl_root)
    cfg2.optim.lr = 0.01
    server_free = Server(cfg2, AllClientData(cfg2))
    server_free.train_round()

    # both servers started from identical global weights (same seed); the
    # proximal run's client must stay closer to ITS round-start global model
    start = jax.tree_util.tree_leaves(
        Server(_tiny_cfg(fl_root), AllClientData(_tiny_cfg(fl_root))).federated_vars["params"])
    def dist_from_start(server):
        c = jax.tree_util.tree_leaves(server.clients[0].trained_backbone["params"])
        return sum(float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))
                   for a, b in zip(start, c))
    assert dist_from_start(server_prox) < dist_from_start(server_free)


def test_branch_step_with_reweight_and_detach(fl_root):
    """Less-common trainer flags (reweight_cosface, BCE_detach) compile and run."""
    cfg = _tiny_cfg(fl_root, reweight_cosface=True, bce_detach=True)
    data = AllClientData(cfg)
    server = Server(cfg, data)
    stats = server.train_round()
    assert np.isfinite(stats["avg_loss"])


def test_collapsed_feature_warning(fl_root):
    """An exploded pretrained backbone pins the CosFace CE at its
    all-equal-cosine saturation s*m + log(C-1) with zero net gradient; the
    client must flag it (observed live: sphere64/E512 pretrained at lr 0.01,
    XNorm 1.2e18, loss frozen at 14.944 for a full round before NaN)."""
    import logging

    from fedfr_tpu.federated.trainer import StepMetrics

    cfg = _tiny_cfg(fl_root)
    data = AllClientData(cfg)
    server = Server(cfg, data)
    client = server.clients[0]
    n_fc = IDS_PER_CLIENT + 5  # local rows + public FC rows
    sat = cfg.loss.margin_s * cfg.loss.margin_m + float(np.log(n_fc - 1))

    def pinned_step(state, gvars, lvars, imgs, labels, valid, lr, key, n):
        z = jnp.zeros(())
        return state, StepMetrics(jnp.float32(sat), jnp.float32(sat), z, z)

    feats = server.generate_public_features()
    # capture on the client logger directly: init_logging (run by earlier
    # in-process CLI tests) sets propagate=False on the fedfr_tpu root, so
    # caplog's root handler would never see these records
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    clog = logging.getLogger("fedfr_tpu.client")
    clog.addHandler(handler)
    try:
        client.train_with_public_data(
            server.federated_vars, data.public_dataset, server.pretrained_fc,
            feats, server.pretrained_labels, local_epochs=2, train_decay=8,
            step_fn=pinned_step)
    finally:
        clog.removeHandler(handler)
    assert any("collapsed" in r.getMessage() for r in records)


def test_public_data_without_bce_branch(fl_root):
    """--add_pretrained_data without --BCE_local is a legal reference config
    (client.py:320,383 guards the BCE term); the joint step must run with
    state.bce = None (regression: unconditional state.bce['params'] crash)."""
    cfg = _tiny_cfg(fl_root, bce_local=False)
    data = AllClientData(cfg)
    server = Server(cfg, data)
    stats = server.train_round()
    assert np.isfinite(stats["avg_loss"])
    assert server.clients[0].bce_vars is None


def test_cached_contrastive_step_matches_recompute():
    """The cached-contrastive step (per-round frozen-feature cache + gather)
    must produce the same update as recomputing the two frozen forwards in
    the step: same flip mask from the same key, eval-mode frozen models."""
    from fedfr_tpu.federated.embed import make_embed_fn
    from fedfr_tpu.federated.trainer import (init_client_state,
                                             make_branch_train_step)

    backbone = build_backbone("toy", embedding_size=16, bf16=False)
    N, B, H, C = 12, 4, IMG, 3
    rng0 = np.random.default_rng(0)
    images = rng0.integers(0, 255, (N, H, H, 3), np.uint8)
    zeros = jnp.zeros((1, H, H, 3))
    v_cur = jax.device_get(backbone.init(jax.random.PRNGKey(0), zeros, train=False))
    v_glob = backbone.init(jax.random.PRNGKey(1), zeros, train=False)
    v_last = backbone.init(jax.random.PRNGKey(2), zeros, train=False)
    fc = np.asarray(0.01 * np.random.default_rng(3).normal(size=(C, 16)),
                    np.float32)

    step = make_branch_train_step(backbone, None, contrastive=True)
    cstep = make_branch_train_step(backbone, None, contrastive=True,
                                   cached_contrastive=True)
    embed = make_embed_fn(backbone)
    u8 = jnp.asarray(images)
    caches = []
    for v in (v_glob, v_last):
        caches.append(jnp.stack([embed(v, u8), embed(v, u8[:, :, ::-1, :])],
                                axis=1))
    idx = np.array([3, 7, 1, 9], np.int32)
    batch, labels = images[idx], np.array([0, 1, 2, 0], np.int32)
    valid = np.ones(B, bool)
    key = jax.random.PRNGKey(42)

    s1, m1 = step(init_client_state(jax.tree_util.tree_map(jnp.asarray, v_cur),
                                    jnp.asarray(fc), None),
                  v_glob, v_last, batch, labels, valid,
                  jnp.float32(0.1), key, 0)
    s2, m2 = cstep(init_client_state(jax.tree_util.tree_map(jnp.asarray, v_cur),
                                     jnp.asarray(fc), None),
                   caches[0], caches[1], batch, labels, valid, idx,
                   jnp.float32(0.1), key, 0)
    np.testing.assert_allclose(float(m1.con_loss), float(m2.con_loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-7),
        jax.device_get(s1.backbone), jax.device_get(s2.backbone))


def test_cached_contrastive_round_matches_recompute(fl_root):
    """A full sequential round with fed.cache_contrastive tracks the
    recompute round: same loaders, same augmentation stream, same losses and
    aggregated model within fp32 tolerance."""
    out = {}
    for cached in (False, True):
        cfg = _tiny_cfg(fl_root, cache_contrastive=cached)
        data = AllClientData(cfg)
        server = Server(cfg, data)
        stats = server.train_round()
        out[cached] = (stats["avg_loss"],
                       jax.tree_util.tree_map(np.asarray, server.federated_vars))
    np.testing.assert_allclose(out[False][0], out[True][0], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        out[False][1], out[True][1])


def test_parallel_cached_contrastive_matches_sequential(fl_root):
    """The client-parallel round with fed.cache_contrastive (stacked
    bucket-padded frozen-feature caches, per-client gathers) matches the
    sequential cached round the same way the recompute paths match."""
    from fedfr_tpu.parallel.mesh import make_mesh

    cfg_s = _tiny_cfg(fl_root, cache_contrastive=True)
    cfg_p = _tiny_cfg(fl_root, cache_contrastive=True)
    server_s = Server(cfg_s, AllClientData(cfg_s))
    server_p = Server(cfg_p, AllClientData(cfg_p))

    server_s.train_round()
    mesh = make_mesh((NUM_CLIENTS, 1, 1), devices=jax.devices()[:NUM_CLIENTS])
    server_p.train_round_parallel(mesh)

    for a, b in zip(jax.tree_util.tree_leaves(server_s.federated_vars),
                    jax.tree_util.tree_leaves(server_p.federated_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(server_s.pretrained_fc, server_p.pretrained_fc,
                               rtol=1e-6, atol=1e-6)
    for cs, cp in zip(server_s.clients, server_p.clients):
        np.testing.assert_allclose(cs.fc_local, cp.fc_local,
                                   rtol=1e-6, atol=1e-6)


def test_dropout_backbone_trains():
    """--dropout wires a live stochastic layer: the trainable forward needs
    (and gets) a dropout rng from the step's fold_in stream, eval forwards
    stay deterministic, and both step families train it without error
    (reference iresnet.py factory kwarg; its FedFR path never sets it,
    so nonzero dropout is extra capability that must not crash)."""
    from fedfr_tpu.federated.trainer import (init_client_state,
                                             make_branch_train_step,
                                             make_plain_train_step)

    E, B, H = 16, 4, IMG
    backbone = build_backbone("iresnet18", embedding_size=E, dropout=0.5,
                              bf16=False)
    zeros = jnp.zeros((1, H, H, 3))
    variables = backbone.init(jax.random.PRNGKey(0), zeros, train=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H, H, 3)),
                    jnp.float32)

    # dropout is active in train mode (distinct rngs -> distinct features)
    # and silent in eval mode (no rng needed, deterministic)
    f1, _ = backbone.apply(variables, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
    f2, _ = backbone.apply(variables, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    e1 = backbone.apply(variables, x, train=False)
    e2 = backbone.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    imgs = np.random.default_rng(1).integers(0, 255, (B, H, H, 3), np.uint8)
    labels = np.array([0, 1, 2, 0], np.int32)
    valid = np.ones(B, bool)
    key = jax.random.PRNGKey(3)
    fc = jnp.asarray(0.01 * np.random.default_rng(2).normal(size=(3, E)),
                     jnp.float32)

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    pstep = make_plain_train_step(backbone)
    state = init_client_state(copy(variables), jnp.copy(fc), None)  # donated
    state, loss = pstep(state, imgs, labels, valid, jnp.float32(0.01), key, 0)
    assert np.isfinite(float(loss))

    bstep = make_branch_train_step(backbone, None, contrastive=True)
    v_glob = backbone.init(jax.random.PRNGKey(4), zeros, train=False)
    state2 = init_client_state(copy(variables), jnp.copy(fc), None)
    state2, metrics = bstep(state2, v_glob, copy(variables), imgs, labels,
                            valid, jnp.float32(0.01), key, 0)
    assert np.isfinite(float(metrics.loss))
