"""End-to-end IJB-C pipeline test on a synthetic miniature benchmark."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fedfr_tpu.evalsuite.ijbc import run_ijbc  # noqa: E402
from fedfr_tpu.federated.embed import auto_embed_fn  # noqa: E402
from fedfr_tpu.models import build_backbone  # noqa: E402


N_SUBJECTS = 4
IMGS_PER_SUBJECT = 3


@pytest.fixture(scope="module")
def ijbc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ijbc")
    meta = root / "meta" / "IJBC_meta"
    crop = root / "loose_crop"
    meta.mkdir(parents=True)
    crop.mkdir()

    rng = np.random.default_rng(0)
    # canonical-ish landmarks inside a 150x120 face crop
    base_lmk = np.array([[45, 60], [85, 60], [65, 80], [50, 100], [80, 100]],
                        np.float32)

    names, tids, mids, lines = [], [], [], []
    tid = 0
    img_id = 0
    gallery, probes = [], []
    for s in range(N_SUBJECTS):
        color = rng.integers(40, 255, 3)
        # gallery template: 1 image / 1 media
        # probe template: 2 images / 2 medias
        for t_kind in ("g", "p"):
            count = 1 if t_kind == "g" else 2
            for k in range(count):
                name = f"img_{img_id}.jpg"
                img = np.zeros((150, 120, 3), np.uint8)
                img[:] = color
                noise = rng.integers(0, 30, (150, 120, 3))
                img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
                cv2.imwrite(str(crop / name), img)
                lmk = base_lmk + rng.normal(0, 1.0, (5, 2)).astype(np.float32)
                score = 0.9 + 0.05 * rng.random()
                lines.append(name + " " + " ".join(
                    f"{v:.3f}" for v in lmk.reshape(-1)) + f" {score:.4f}")
                names.append(name)
                tids.append(tid)
                mids.append(1000 + img_id if t_kind == "g" else 2000 + k)
                img_id += 1
            if t_kind == "g":
                gallery.append((tid, s))
            else:
                probes.append((tid, s))
            tid += 1

    with open(meta / "ijbc_face_tid_mid.txt", "w") as f:
        for n, t, m in zip(names, tids, mids):
            f.write(f"{n} {t} {m}\n")
    with open(meta / "ijbc_name_5pts_score.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    # 1:1 pairs: each probe template vs every gallery template
    with open(meta / "ijbc_template_pair_label.txt", "w") as f:
        for pt, ps in probes:
            for gt, gs in gallery:
                f.write(f"{pt} {gt} {int(ps == gs)}\n")
    # 1:n galleries split across G1/G2, probe_mixed = all probes
    with open(meta / "ijbc_1N_gallery_G1.csv", "w") as f:
        f.write("TEMPLATE_ID,SUBJECT_ID\n")
        for gt, gs in gallery[: N_SUBJECTS // 2]:
            f.write(f"{gt},{gs}\n")
    with open(meta / "ijbc_1N_gallery_G2.csv", "w") as f:
        f.write("TEMPLATE_ID,SUBJECT_ID\n")
        for gt, gs in gallery[N_SUBJECTS // 2:]:
            f.write(f"{gt},{gs}\n")
    with open(meta / "ijbc_1N_probe_mixed.csv", "w") as f:
        f.write("TEMPLATE_ID,SUBJECT_ID\n")
        for pt, ps in probes:
            f.write(f"{pt},{ps}\n")
    return str(root)


def test_run_ijbc_both_jobs(ijbc_root, tmp_path):
    backbone = build_backbone("toy", 32)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 112, 112, 3)), train=False)
    embed_fn = auto_embed_fn(backbone)  # sharded on the 8-device test mesh
    results = run_ijbc(embed_fn, variables, ijbc_root, str(tmp_path),
                       epoch=3, job="both", batch_size=4)
    assert len(results["tpr_at_fpr"]) == 6
    assert set(results["rank"]) == {"top1", "top5", "top10"}
    assert set(results["tpir_at_fpir"]) == {0.01, 0.1}
    # subjects are solid colors -> toy embeddings separate them perfectly
    assert results["rank"]["top1"] == 1.0
    # logs + score dump in the reference layout
    assert os.path.exists(os.path.join(str(tmp_path), "ijbc-1:1", "log.txt"))
    assert os.path.exists(os.path.join(str(tmp_path), "ijbc-1:1", "ijbc.npy"))
    log = open(os.path.join(str(tmp_path), "ijbc-1:n", "log.txt")).read()
    assert "Epoch 3" in log and "top1" in log
    # aligned-image cache written (IJBC_imgs.npy equivalent)
    assert os.path.exists(os.path.join(ijbc_root, "IJBC_imgs.npy"))


def test_run_ijbc_uses_cache_second_time(ijbc_root, tmp_path):
    import shutil

    backbone = build_backbone("toy", 32)
    variables = backbone.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 112, 112, 3)), train=False)
    embed_fn = auto_embed_fn(backbone)  # sharded on the 8-device test mesh
    # first run populates the IJBC_imgs.npy cache (the test must not depend
    # on a sibling test having run first)
    run_ijbc(embed_fn, variables, ijbc_root, str(tmp_path / "warm"),
             epoch=0, job="1:1", batch_size=4)
    # remove the source crops: only the cache can serve the aligned images
    # now, so a silent cache miss fails loudly
    crop = os.path.join(ijbc_root, "loose_crop")
    backup = os.path.join(ijbc_root, "loose_crop_backup")
    shutil.move(crop, backup)
    try:
        results = run_ijbc(embed_fn, variables, ijbc_root, str(tmp_path),
                           epoch=0, job="1:1", batch_size=4)
    finally:
        shutil.move(backup, crop)
    assert len(results["tpr_at_fpr"]) == 6


def test_ijbc_conti_cli_multi_epoch(ijbc_root, tmp_path):
    """ijbc_conti drives multiple epoch checkpoints in-process (replacing the
    reference's os.system loop, ijbc_conti.py:14-23) and appends per-epoch
    results to the ijbc logs."""
    import argparse

    import ijbc_conti

    from fedfr_tpu.utils.checkpoint import save_native

    backbone = build_backbone("toy", 16)
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    for e in (0, 1):
        variables = jax.device_get(backbone.init(
            jax.random.PRNGKey(e), jnp.zeros((1, 112, 112, 3)), train=False))
        save_native(variables, str(ckpt_dir / f"backbone_{e}.npz"))

    args = argparse.Namespace(ckpt_dir=str(ckpt_dir), root_path=ijbc_root,
                              batch_size=8, job="both", epoch=[0, 1],
                              network="toy", embedding_size=16, gpu=None)
    ijbc_conti.main(args)
    log11 = open(ckpt_dir / "ijbc-1:1" / "log.txt").read()
    assert log11.count("TPR@FPR") >= 2 or log11.count("1e-") >= 2
    assert os.path.exists(ckpt_dir / "ijbc-1:n" / "log.txt")


def test_run_ijbc_device_engine_matches_host(ijbc_root, tmp_path):
    """The device-resident engine (features in HBM end-to-end: segment-sum
    aggregation + chunked gather/dot scoring) must reproduce the host numpy
    pipeline."""
    backbone = build_backbone("toy", 32)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 112, 112, 3)), train=False)
    embed_fn = auto_embed_fn(backbone)
    host = run_ijbc(embed_fn, variables, ijbc_root, str(tmp_path / "h"),
                    epoch=0, job="both", batch_size=4, engine="host")
    dev = run_ijbc(embed_fn, variables, ijbc_root, str(tmp_path / "d"),
                   epoch=0, job="both", batch_size=4, engine="device")
    assert host["tpr_at_fpr"] == dev["tpr_at_fpr"]
    assert host["rank"] == dev["rank"]
    assert host["tpir_at_fpir"] == dev["tpir_at_fpir"]
    s_h = np.load(os.path.join(str(tmp_path / "h"), "ijbc-1:1", "ijbc.npy"))
    s_d = np.load(os.path.join(str(tmp_path / "d"), "ijbc-1:1", "ijbc.npy"))
    np.testing.assert_allclose(s_h, s_d, atol=2e-6)


def test_device_aggregation_and_scores_match_host_oracle():
    from fedfr_tpu.evalsuite.ijbc import (
        image_to_template_features,
        image_to_template_features_device,
        pair_scores,
        pair_scores_device,
    )

    rng = np.random.default_rng(11)
    n, dim, n_tmpl = 400, 16, 37
    feats = rng.standard_normal((n, dim), dtype=np.float32)
    templates = rng.integers(0, n_tmpl, n).astype(np.int64)
    templates[:n_tmpl] = np.arange(n_tmpl)
    medias = rng.integers(0, 4, n).astype(np.int64)

    tf_h, ut_h = image_to_template_features(feats, templates, medias)
    tf_d, ut_d = image_to_template_features_device(jnp.asarray(feats),
                                                   templates, medias)
    np.testing.assert_array_equal(ut_h, ut_d)
    np.testing.assert_allclose(np.asarray(tf_d), tf_h, atol=1e-5)

    # choose_templates subset (1:n gallery path): dropped rows must not leak
    choose_t = np.unique(templates)[::3]
    choose_ids = choose_t * 7
    sub_h, sut_h, ids_h = image_to_template_features(
        feats, templates, medias, choose_t, choose_ids)
    sub_d, sut_d, ids_d = image_to_template_features_device(
        jnp.asarray(feats), templates, medias, choose_t, choose_ids)
    np.testing.assert_array_equal(sut_h, sut_d)
    np.testing.assert_array_equal(ids_h, ids_d)
    np.testing.assert_allclose(np.asarray(sub_d), sub_h, atol=1e-5)

    p1 = ut_h[rng.integers(0, len(ut_h), 1000)]
    p2 = ut_h[rng.integers(0, len(ut_h), 1000)]
    s_h = pair_scores(tf_h, ut_h, p1, p2)
    s_d = pair_scores_device(tf_d, ut_d, p1, p2, chunk=128)
    np.testing.assert_allclose(s_d, s_h, atol=2e-6)


def test_aggregation_empty_choose_templates():
    """choose_templates disjoint from the tid/mid list: both engines must
    return zero vectors instead of crashing (regression: the sort+reduceat
    rewrite IndexError'd on an empty keep mask)."""
    from fedfr_tpu.evalsuite.ijbc import (
        image_to_template_features,
        image_to_template_features_device,
    )

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((20, 8), dtype=np.float32)
    templates = np.arange(20, dtype=np.int64)
    medias = np.zeros(20, np.int64)
    choose = np.array([100, 101], np.int64)  # not present
    ids = np.array([7, 8], np.int64)

    out_h, ut_h, ids_h = image_to_template_features(
        feats, templates, medias, choose, ids)
    assert out_h.shape == (2, 8) and not out_h.any()
    out_d, ut_d, ids_d = image_to_template_features_device(
        jnp.asarray(feats), templates, medias, choose, ids)
    np.testing.assert_array_equal(np.asarray(out_d), out_h)
    np.testing.assert_array_equal(ut_h, ut_d)


def test_posttrain_synth_ijbc_root_roundtrip(tmp_path):
    """The posttrain harness's protocol-scale IJB-C synthesizer
    (experiments/posttrain_eval_tpu.py::build_synth_ijbc_root) at miniature
    counts: the generated meta files + IJBC_imgs.npy cache must drive
    run_ijbc end-to-end (both jobs), and the genuine/impostor pair labels
    must separate under a real embedding (distinct block identities)."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "posttrain_eval_tpu",
        os.path.join(repo, "experiments", "posttrain_eval_tpu.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    root = str(tmp_path / "ijbc")
    synth = ("synth:clients=2,ids_per_client=2,public_ids=4,public_imgs=20,"
             "veri_ids=4,veri_imgs=2,image_size=32,block=8,noise=5")
    mod.build_synth_ijbc_root(root, synth, n_subjects=6,
                              n_probe_templates=18, n_images=300,
                              n_pairs=600)
    assert os.path.exists(os.path.join(root, ".complete"))
    # idempotent re-entry
    mod.build_synth_ijbc_root(root, synth, n_subjects=6,
                              n_probe_templates=18, n_images=300,
                              n_pairs=600)

    backbone = build_backbone("toy", 32)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)), train=False)
    embed_fn = auto_embed_fn(backbone)
    results = run_ijbc(embed_fn, variables, root, str(tmp_path / "res"),
                       epoch=0, job="both", batch_size=32)
    assert len(results["tpr_at_fpr"]) == 6
    assert set(results["rank"]) == {"top1", "top5", "top10"}
    # block identities are visually distinct (noise=5) -> even a
    # random-projection toy embedding ranks own-gallery well above the
    # 1/6 chance level
    assert results["rank"]["top1"] > 0.4
