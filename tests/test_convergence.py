"""Learning sanity: the training engine must actually separate classes."""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from fedfr_tpu.data import codec, write_split
from fedfr_tpu.data.datasets import FaceRecordDataset
from fedfr_tpu.federated.embed import embed_dataset, make_embed_fn
from fedfr_tpu.federated.trainer import init_client_state, make_plain_train_step
from fedfr_tpu.models import build_backbone


def _class_separation(feats, labels):
    """mean intra-class cosine minus mean inter-class cosine."""
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = f @ f.T
    same = labels[:, None] == labels[None, :]
    np.fill_diagonal(same, False)
    off = ~np.eye(len(f), dtype=bool)
    return sim[same].mean() - sim[off & ~same].mean()


def test_plain_training_learns_separation(tmp_path):
    rng = np.random.default_rng(0)
    n_cls, per, hw = 4, 12, 24
    payloads, labels = [], []
    for c in range(n_cls):
        base = rng.integers(0, 255, size=(hw, hw, 3))
        for _ in range(per):
            img = np.clip(base + rng.integers(-25, 25, (hw, hw, 3)), 0, 255)
            payloads.append(codec.encode_raw(img.astype(np.uint8)))
            labels.append(c)
    root = tmp_path / "ds"
    root.mkdir()
    write_split(str(root / "train.idx"), str(root / "train.rec"),
                payloads, labels, num_classes=n_cls, id_base=0)
    ds = FaceRecordDataset(str(root))

    backbone = build_backbone("toy", 16)
    key = jax.random.PRNGKey(0)
    bvars = backbone.init(key, jnp.zeros((1, hw, hw, 3)), train=False)
    fc = 0.01 * jax.random.normal(key, (n_cls, 16))
    state = init_client_state(jax.device_get(bvars), jnp.asarray(fc), None)
    step = make_plain_train_step(backbone)

    embed_fn = make_embed_fn(backbone)
    feats0, labs = embed_dataset(embed_fn, {"params": jax.device_get(state.backbone["params"]),
                                            "batch_stats": jax.device_get(state.backbone["batch_stats"])},
                                 ds, 16)
    sep0 = _class_separation(feats0, labs)

    from fedfr_tpu.data.datasets import BatchLoader

    loader = BatchLoader(ds, 16, shuffle=True, seed=1, drop_last=True)
    losses = []
    n_steps = 0
    for epoch in range(60):
        for imgs, lbl, valid in loader.epoch():
            state, loss = step(state, jnp.asarray(imgs), jnp.asarray(lbl),
                               jnp.asarray(valid), 0.05, key, n_steps)
            n_steps += 1
        losses.append(float(loss))

    final_vars = jax.device_get(state.backbone)
    feats1, _ = embed_dataset(embed_fn, final_vars, ds, 16)
    sep1 = _class_separation(feats1, labs)

    assert losses[-1] < losses[0] - 3.0, (losses[0], losses[-1])
    assert sep1 > sep0 + 0.1, (sep0, sep1)


def test_full_cli_chain_improves_metrics(tmp_path):
    """Miniature of the real-TPU convergence experiment
    (experiments/convergence_tpu.py): the FULL CLI chain — split generators,
    train.py with every FedFR mechanism over multiple rounds on the
    8-device client-parallel path — must IMPROVE the .bin pair accuracy and
    the personalized local TPR on a learnable synthetic identity dataset.
    Slow (~2 min): multi-round end-to-end training."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "convergence_tpu", os.path.join(repo, "experiments", "convergence_tpu.py"))
    exp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(exp)

    num_clients, num_ids, pub_ids, img, imgs_per_id, test_imgs = 2, 8, 4, 24, 10, 4
    rng = np.random.default_rng(100)

    src = tmp_path / "src"
    src.mkdir()
    payloads, labels = [], []
    for pid in range(3 * num_ids):
        block = rng.integers(30, 226, size=(4, 4, 3))
        base = np.kron(block, np.ones((img // 4, img // 4, 1), dtype=np.int64))
        for _ in range(imgs_per_id):
            payloads.append(codec.encode_raw(exp.make_identity_image(rng, base)))
            labels.append(pid)
    write_split(str(src / "train.idx"), str(src / "train.rec"),
                payloads, labels, num_classes=3 * num_ids)

    out = tmp_path / "out"
    from tests.helpers import run_split_clis

    run_split_clis(src, out, num_client=num_clients, num_id=num_ids,
                   imgs_per_id=imgs_per_id, test_imgs=test_imgs,
                   pub_ids=pub_ids)
    (out / f"split_pretrain_{pub_ids}").rename(out / "split_pretrain_6000")

    veri_dir = str(out / f"local_veri_{num_ids}")
    exp.make_bin(str(tmp_path / "val" / "agedb_30.bin"), veri_dir, n_pairs=48)

    import train as train_cli

    run_dir = tmp_path / "run"
    args = argparse.Namespace(
        network="toy", loss="CosFace", output_dir=str(run_dir),
        batch_size=8, local_epoch=2, total_round=3,
        num_client=num_clients, num_ids=num_ids, client_sampled_ratio=1.0,
        pretrained_root="", lr=0.02, aggr_alg="FedAvg", spreadout=True,
        init_fc=True, add_pretrained_data=True, contrastive_bb=True,
        return_all=True, combine_dataset=True, BCE_local=True,
        BCE_detach=False, adaptive_local_epoch=False, reweight_cosface=False,
        hn_strategy="feature", HN_threshold=-1.0,
        rec_root=str(out), val_root=str(tmp_path / "val"),
        local_rec=veri_dir, val_targets="agedb_30", num_workers=2, seed=100,
        embedding_size=32, image_size=img, resume=False, profile=False,
        scan_blocks=False, com_batch_size=16, public_batch_size=16,
        eval_batch_size=16)
    train_cli.main(args)

    agedb, tprs = exp.parse_progression(str(run_dir))
    assert len(agedb) == 3
    accs = [a for _, a in agedb]
    baseline_tpr = [t[0] for e, t in tprs if e == -1]       # TPR@1e-1
    trained_tpr = [t[0] for e, t in tprs if e >= 0]

    # .bin accuracy at the final round beats the first-round accuracy
    assert accs[-1] >= accs[0], accs
    # and training moved the needle somewhere: either .bin accuracy or the
    # personalized local TPR improved by a real margin
    assert (accs[-1] > accs[0] + 0.02
            or np.mean(trained_tpr[-num_clients:]) > np.mean(baseline_tpr) + 2.0), \
        (accs, np.mean(baseline_tpr), np.mean(trained_tpr[-num_clients:]))
