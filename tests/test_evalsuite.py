"""Evaluation-suite tests: k-fold protocol, ROC histogram, IJB-C math."""

import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from fedfr_tpu.ops.kfold import calculate_roc, calculate_val, evaluate, kfold_indices
from fedfr_tpu.ops.roc_histogram import (
    client_roc,
    pairwise_roc_histogram,
    reorder_target_first,
    roc_from_histogram,
    tpr_at_fpr_table,
)
from fedfr_tpu.evalsuite.align import ARCFACE_SRC, umeyama
from fedfr_tpu.evalsuite.ijbc import (
    gen_mask,
    identification_1n,
    image_to_template_features,
    pair_scores,
    tpr_at_fpr,
)
from fedfr_tpu.evalsuite.local_eval import (
    client_query_mask,
    mean_tpr_tables,
    open_set_identification,
)
from fedfr_tpu.utils.table import ascii_table


# ---------------------------------------------------------------- kfold

def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold

    for n, k in [(100, 10), (103, 10), (7, 3)]:
        ours = kfold_indices(n, k)
        theirs = list(KFold(n_splits=k, shuffle=False).split(np.arange(n)))
        for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
            np.testing.assert_array_equal(tr_a, tr_b)
            np.testing.assert_array_equal(te_a, te_b)


def _verification_oracle(embeddings, issame):
    """Direct reimplementation of the reference fold loops
    (eval/verification.py:54-176) as a test oracle."""
    from sklearn.model_selection import KFold
    from scipy import interpolate

    emb1, emb2 = embeddings[0::2], embeddings[1::2]
    dist = np.sum((emb1 - emb2) ** 2, axis=1)
    issame = np.asarray(issame, bool)
    n = len(issame)

    def acc(th, d, s):
        pred = d < th
        tp = np.sum(pred & s); tn = np.sum(~pred & ~s)
        return (tp + tn) / len(d)

    thresholds = np.arange(0, 4, 0.01)
    folds = list(KFold(10, shuffle=False).split(np.arange(n)))
    accuracy = []
    for tr, te in folds:
        accs_tr = [acc(t, dist[tr], issame[tr]) for t in thresholds]
        best = thresholds[int(np.argmax(accs_tr))]
        accuracy.append(acc(best, dist[te], issame[te]))

    thresholds = np.arange(0, 4, 0.001)
    vals = []
    for tr, te in folds:
        far_tr = []
        for t in thresholds:
            pred = dist[tr] < t
            fa = np.sum(pred & ~issame[tr])
            far_tr.append(fa / max(np.sum(~issame[tr]), 1))
        far_tr = np.array(far_tr)
        if far_tr.max() >= 1e-3:
            # newer scipy rejects duplicate x; keep the LAST point of each FAR
            # plateau, which is the interval old interp1d's searchsorted used
            uniq, first_rev = np.unique(far_tr[::-1], return_index=True)
            last = len(far_tr) - 1 - first_rev
            f = interpolate.interp1d(uniq, thresholds[last], kind="slinear")
            th = f(1e-3)
        else:
            th = 0.0
        pred = dist[te] < th
        vals.append(np.sum(pred & issame[te]) / max(np.sum(issame[te]), 1))
    return np.mean(accuracy), np.std(accuracy), np.mean(vals)


def test_evaluate_matches_reference_protocol():
    rng = np.random.default_rng(0)
    n_pairs = 300
    issame = rng.random(n_pairs) > 0.5
    emb = rng.standard_normal((2 * n_pairs, 16))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    # give genuine pairs correlated embeddings
    for i in range(n_pairs):
        if issame[i]:
            emb[2 * i + 1] = emb[2 * i] + 0.3 * emb[2 * i + 1]
            emb[2 * i + 1] /= np.linalg.norm(emb[2 * i + 1])
    _, _, accuracy, val, _, _ = evaluate(emb, issame, 10)
    oracle_acc, oracle_std, oracle_val = _verification_oracle(emb, issame)
    np.testing.assert_allclose(accuracy.mean(), oracle_acc, atol=1e-9)
    np.testing.assert_allclose(val, oracle_val, atol=5e-3)


# --------------------------------------------------------- roc histogram

def _brute_force_hist(feats, labels, target_size):
    hist = np.zeros((2001, 2), np.int64)
    n = len(feats)
    for i in range(min(target_size, n)):
        for j in range(i + 1, n):
            cos = float(feats[i] @ feats[j])
            b = int((cos + 1) * 1000)
            b = min(max(b, 0), 2000)
            if labels[i] == labels[j]:
                hist[b, 0] += 1
            else:
                hist[b, 1] += 1
    return hist


def test_pairwise_histogram_matches_bruteforce():
    rng = np.random.default_rng(1)
    n, e = 60, 8
    feats = rng.standard_normal((n, e)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = rng.integers(0, 5, n).astype(np.int32)
    tsize = 23
    hist = pairwise_roc_histogram(feats, labels, tsize, tile_i=16, tile_j=32)
    brute = _brute_force_hist(feats, labels, tsize)
    assert hist.sum() == brute.sum() == tsize * n - tsize * (tsize + 1) // 2
    np.testing.assert_array_equal(hist, brute)


def test_histogram_binning_modes_agree():
    """The MXU matmul bincount (radix one-hot + A^T B, integer-exact in
    f32 accumulation) equals the sort-based bincount, including the chunked
    path and a degenerate all-one-bucket input."""
    import jax

    from fedfr_tpu.ops.roc_histogram import _count_matmul, _count_sort

    rng = np.random.default_rng(3)
    bins = 2001
    for combined in [
        rng.integers(0, 2 * bins + 1, size=(97, 53)).astype(np.int32),
        np.full((64, 64), 7, np.int32),        # all pairs in one bucket
        np.full((8, 8), 2 * bins, np.int32),   # all pairs dead/invalid
    ]:
        a = np.asarray(jax.jit(lambda c: _count_matmul(c, bins))(combined))
        b = np.asarray(jax.jit(lambda c: _count_sort(c, bins))(combined))
        np.testing.assert_array_equal(a, b)
        assert a.sum() == (combined != 2 * bins).sum()


def test_sharded_histogram_matches_single_device():
    """j-rows sharded over 8 virtual devices + psum == single-device result."""
    from fedfr_tpu.ops.roc_histogram import pairwise_roc_histogram_sharded
    from fedfr_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    n, e = 128, 8
    feats = rng.standard_normal((n, e)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = rng.integers(0, 6, n).astype(np.int32)
    tsize = 40
    mesh = make_mesh((1, 8, 1))
    sharded = np.asarray(pairwise_roc_histogram_sharded(
        mesh, feats, labels, tsize, tile_i=8, tile_j=8)).reshape(2001, 2)
    # the public entry point auto-dispatches to the sharded kernel when >1
    # device is visible (production wiring) — must equal both layouts
    auto = pairwise_roc_histogram(feats, labels, tsize, tile_i=8, tile_j=16)
    from fedfr_tpu.ops.roc_histogram import pairwise_roc_histogram_device

    single = np.asarray(pairwise_roc_histogram_device(
        feats, labels, tsize, tile_i=8, tile_j=16)).reshape(2001, 2)
    np.testing.assert_array_equal(sharded, single)
    np.testing.assert_array_equal(auto, single)


def test_tpr_table_matches_scipy_interp():
    """tpr_at_fpr_table reproduces plot_ROC's interp1d (roc_cuda.py:69-71)."""
    from scipy.interpolate import interp1d

    rng = np.random.default_rng(2)
    hist = rng.integers(0, 1000, size=(2001, 2)).astype(np.int64)
    tpr, fpr = roc_from_histogram(hist)
    idx = np.argsort(fpr)
    roc = interp1d(fpr[idx], tpr[idx])
    expect = [float("%.2f" % (100 * roc(10.0 ** e))) for e in range(-1, -7, -1)]
    got = tpr_at_fpr_table(hist)
    assert got == expect


def test_client_roc_separable_features():
    """Positives above every negative, negatives spread over bins ->
    perfect TPR at every populated FPR level."""
    rng = np.random.default_rng(11)
    ids, per, e = 6, 5, 16
    feats = np.zeros((ids * per, e), np.float32)
    labels = np.zeros(ids * per, np.int32)
    for c in range(ids):
        proto = np.zeros(e, np.float32)
        proto[c] = 1.0
        noise = 0.05 * rng.standard_normal((per, e)).astype(np.float32)
        noise[:, c] = 0
        block = proto[None, :] + noise  # same-id sims ~0.995+, cross-id ~ spread near 0
        feats[c * per:(c + 1) * per] = block / np.linalg.norm(block, axis=1, keepdims=True)
        labels[c * per:(c + 1) * per] = c
    table = client_roc(feats, labels, 0, 2, tile_i=8, tile_j=16)
    assert table[0] == 100.0  # TPR@FPR=1e-1 perfect
    assert all(t0 >= t1 for t0, t1 in zip(table, table[1:]))  # monotone in FPR


def test_reorder_target_first():
    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    labels = np.array([5, 1, 5, 2, 1, 5])
    f, l, t = reorder_target_first(feats, labels, 5, 6)
    assert t == 3
    np.testing.assert_array_equal(l[:3], [5, 5, 5])
    np.testing.assert_array_equal(f[0], feats[0])
    np.testing.assert_array_equal(f[1], feats[2])


# ------------------------------------------------------------ local 1:n

def test_open_set_identification_reference_math():
    """Cross-check against a literal port of local_all.py:142-177."""
    import heapq
    import math as pymath

    rng = np.random.default_rng(3)
    q, g, e = 50, 10, 8
    qf = rng.standard_normal((q, e)).astype(np.float32)
    gf = rng.standard_normal((g, e)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    gf /= np.linalg.norm(gf, axis=1, keepdims=True)
    mask = np.full(q, -1, np.int64)
    mask[:20] = rng.integers(0, g, 20)

    fars = [1e-2, 1e-1]
    result, _ = open_set_identification(qf.copy(), gf, mask, fars=fars)

    sim = qf @ gf.T
    pos_sims = []
    for i in range(q):
        if mask[i] != -1:
            pos_sims.append(sim[i, mask[i]])
            sim[i, mask[i]] = -2.0
    pos_sims = np.array(pos_sims)
    neg_sims = sim[sim > -2.0]
    required = [pymath.ceil(q * f) for f in fars]
    neg_sorted = heapq.nlargest(max(required), neg_sims.tolist())
    expect = []
    for far, pos in zip(fars, required):
        th = neg_sorted[pos - 1]
        expect.append(np.sum(pos_sims > th) / (40 * g))
    np.testing.assert_allclose(result, expect, rtol=1e-6)


def test_client_query_mask():
    labels = np.repeat(np.arange(6), 2)  # 6 ids x 2 imgs
    mask = client_query_mask(labels, 2, 4)
    np.testing.assert_array_equal(mask[:4], [-1, -1, -1, -1])
    np.testing.assert_array_equal(mask[4:8], [0, 0, 1, 1])
    np.testing.assert_array_equal(mask[8:], [-1, -1, -1, -1])


def test_mean_tpr_tables_order():
    t = mean_tpr_tables([[90.0, 80.0, 70.0], [92.0, 82.0, 72.0]])
    assert t == [71.0, 81.0, 91.0]  # reversed (-6..-1 -> ... -1)


# ----------------------------------------------------------------- ijbc

def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(4)
    theta = 0.3
    s = 1.7
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.array([4.0, -2.0])
    src = rng.standard_normal((5, 2))
    dst = (s * src @ R.T) + t
    M = umeyama(src, dst)
    np.testing.assert_allclose(M[:, :2], s * R, atol=1e-8)
    np.testing.assert_allclose(M[:, 2], t, atol=1e-8)


def _template_oracle(img_feats, templates, medias, choose=None):
    """Independent loop-based oracle of the template-aggregation protocol
    (semantics of ijbc_all.py:225-259; written from the SURVEY description,
    not copied)."""
    unique_templates = np.unique(choose if choose is not None else templates)
    out = np.zeros((len(unique_templates), img_feats.shape[1]))
    for c, uqt in enumerate(unique_templates):
        (ind_t,) = np.where(templates == uqt)
        face_feats = img_feats[ind_t]
        face_medias = medias[ind_t]
        um, uc = np.unique(face_medias, return_counts=True)
        media_feats = []
        for u, ct in zip(um, uc):
            (ind_m,) = np.where(face_medias == u)
            if ct == 1:
                media_feats.append(face_feats[ind_m])
            else:
                media_feats.append(np.mean(face_feats[ind_m], axis=0, keepdims=True))
        media_feats = np.array(media_feats)
        out[c] = np.sum(media_feats, axis=0)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-12), unique_templates


def test_template_aggregation_matches_oracle():
    rng = np.random.default_rng(5)
    n = 200
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    templates = rng.integers(0, 20, n)
    medias = rng.integers(0, 6, n)
    ours, ut_ours = image_to_template_features(feats, templates, medias)
    oracle, ut_oracle = _template_oracle(feats, templates, medias)
    np.testing.assert_array_equal(ut_ours, ut_oracle)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_pair_scores_and_tpr_table():
    rng = np.random.default_rng(6)
    tfeats = rng.standard_normal((30, 8))
    tfeats /= np.linalg.norm(tfeats, axis=1, keepdims=True)
    ut = np.arange(1, 31) * 3
    p1 = ut[rng.integers(0, 30, 500)]
    p2 = ut[rng.integers(0, 30, 500)]
    score = pair_scores(tfeats, ut, p1, p2, batch=64)
    t2i = {t: i for i, t in enumerate(ut)}
    expect = np.array([tfeats[t2i[a]] @ tfeats[t2i[b]] for a, b in zip(p1, p2)])
    # scores are f32 like the reference's (ijbc_all.py:311-326 dots torch
    # f32 features); the oracle here is f64
    np.testing.assert_allclose(score, expect, atol=1e-6)
    labels = (rng.random(500) > 0.5).astype(int)
    table = tpr_at_fpr(labels, score)
    assert len(table) == 6 and all(0 <= v <= 100 for v in table)


def test_gen_mask_duplicate_raises():
    with pytest.raises(RuntimeError):
        gen_mask(np.array([1]), np.array([1, 1]))
    out = gen_mask(np.array([2, 1]), np.array([1, 2]))
    np.testing.assert_array_equal(out, [1, 0])


def test_identification_1n_topk():
    gf = np.eye(4, dtype=np.float32)
    qf = np.eye(4, dtype=np.float32) + 0.01
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    rank, pr = identification_1n(qf, gf, np.arange(4), fars=[0.5])
    assert rank["top1"] == 1.0
    assert 0.0 <= pr[0.5] <= 1.0


def test_ascii_table_format():
    out = ascii_table(["a", "bb"], [["1", "2"], ["333", "4"]])
    lines = out.splitlines()
    assert lines[0].startswith("+") and "|" in lines[1]
    assert len(set(len(l) for l in lines)) == 1


def test_load_bin_resize_short_and_cache(tmp_path):
    """Non-112 bins go through resize-short (reference verification.py:218-220)
    and the decoded set is pkl-cached (verification.py:207-230): second load
    hits the cache and returns identical data."""
    import pickle

    from fedfr_tpu.data import codec
    from fedfr_tpu.evalsuite.verification import load_bin

    rng = np.random.default_rng(5)
    n_pairs = 4
    bins, issame = [], []
    for i in range(n_pairs):
        for _ in range(2):
            img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
            bins.append(codec.encode_jpeg(img))
        issame.append(bool(i % 2))
    path = str(tmp_path / "small_100.bin")
    with open(path, "wb") as f:
        pickle.dump((bins, issame), f)

    data, same = load_bin(path, image_size=(112, 112))
    assert data.shape == (2 * n_pairs, 112, 112, 3)
    assert data.dtype == np.uint8
    np.testing.assert_array_equal(same, np.asarray(issame))

    cache = str(tmp_path / "small_100.pkl")
    assert os.path.exists(cache)
    # cache hit: even with the .bin removed, load succeeds and matches
    os.remove(path)
    data2, same2 = load_bin(path, image_size=(112, 112))
    np.testing.assert_array_equal(data2, data)
    np.testing.assert_array_equal(same2, same)

    # a different target size must not be served from the stale cache
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        load_bin(path, image_size=(56, 56))

    # foreign/corrupt .pkl is ignored, not trusted
    with open(cache, "wb") as f:
        f.write(b"not a pickle")
    with _pytest.raises(FileNotFoundError):
        load_bin(path, image_size=(112, 112))  # falls through to missing .bin


def test_bin_embedding_window_semantics():
    """test_bin's final partial batch slides a full-size window ending at N
    (reference verification.py:245-258) — verify rows land correctly."""
    import jax.numpy as jnp

    from fedfr_tpu.evalsuite.verification import test_bin

    rng = np.random.default_rng(12)
    n = 20  # batch 8 -> batches [0:8], [8:16], [12:20] window
    data = rng.integers(0, 255, (n, 8, 8, 3)).astype(np.uint8)
    issame = rng.random(n // 2) > 0.5

    def embed_fn(variables, u8):
        # deterministic "embedding": mean pixel per channel + row checksum
        x = u8.astype(jnp.float32)
        return jnp.stack([x.mean(axis=(1, 2, 3)),
                          x[:, 0, 0, 0], x[:, -1, -1, -1],
                          x.sum(axis=(1, 2, 3)) % 97], axis=1)

    acc, std, xnorm, emb, _ = test_bin(embed_fn, None, data, issame,
                                       batch_size=8, nfolds=2)
    # recompute embeddings directly and compare the flip-sum l2-normalized rows
    direct = np.stack([data.astype(np.float64).mean(axis=(1, 2, 3)),
                       data[:, 0, 0, 0], data[:, -1, -1, -1],
                       data.sum(axis=(1, 2, 3)) % 97], axis=1)
    flipped = data[:, :, ::-1, :]
    direct_f = np.stack([flipped.astype(np.float64).mean(axis=(1, 2, 3)),
                         flipped[:, 0, 0, 0], flipped[:, -1, -1, -1],
                         flipped.sum(axis=(1, 2, 3)) % 97], axis=1)
    s = direct + direct_f
    s = s / np.maximum(np.linalg.norm(s, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(emb, s, rtol=1e-5)


def test_parse_log_roundtrip(tmp_path):
    """parse_log consumes the local_log.txt lines append_local_log writes."""
    import parse_log

    from fedfr_tpu.evalsuite.local_eval import append_local_log

    d = str(tmp_path)
    append_local_log(d, 0, 100, -1, [80.0, 70.0, 60.0, 50.0, 40.0, 30.0])
    append_local_log(d, 0, 100, 9, [95.0, 90.0, 85.0, 80.0, 75.0, 70.0])
    append_local_log(d, 100, 200, -1, [81.0, 71.0, 61.0, 51.0, 41.0, 31.0])
    append_local_log(d, 100, 200, 9, [96.0, 91.0, 86.0, 81.0, 76.0, 71.0])
    acc = parse_log.parse(os.path.join(d, "local_log.txt"))
    assert set(acc) == {0, 100}
    assert acc[0][0] == (-1, [80.0, 70.0, 60.0, 50.0, 40.0, 30.0])
    parse_log.main(os.path.join(d, "local_log.txt"))  # prints summary

    # run-dir mode: merge clients/client_*/local_log.txt
    cdir = os.path.join(d, "run", "clients", "client_0")
    os.makedirs(cdir)
    append_local_log(cdir, 0, 100, -1, [80.0, 70.0, 60.0, 50.0, 40.0, 30.0])
    append_local_log(cdir, 0, 100, 9, [95.0, 90.0, 85.0, 80.0, 75.0, 70.0])
    parse_log.main(os.path.join(d, "run"))


def test_calculate_roc_pca_variant():
    """PCA mode (verification.py:76-88) runs and stays sane on separable data."""
    rng = np.random.default_rng(13)
    n = 100
    issame = rng.random(n) > 0.5
    e1 = rng.standard_normal((n, 16))
    e2 = np.where(issame[:, None], e1 + 0.1 * rng.standard_normal((n, 16)),
                  rng.standard_normal((n, 16)))
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 /= np.linalg.norm(e2, axis=1, keepdims=True)
    thresholds = np.arange(0, 4, 0.01)
    _, _, acc = calculate_roc(thresholds, e1, e2, issame, nrof_folds=5, pca=8)
    assert acc.mean() > 0.8
