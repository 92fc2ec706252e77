"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import numpy as np

from fedfr_tpu.ops.pallas_kernels import max_cosine_similarity


def test_max_cosine_similarity_matches_dense():
    rng = np.random.default_rng(0)
    pub = rng.standard_normal((300, 128)).astype(np.float32)
    loc = rng.standard_normal((70, 128)).astype(np.float32)
    pub /= np.linalg.norm(pub, axis=1, keepdims=True)
    loc /= np.linalg.norm(loc, axis=1, keepdims=True)
    out = np.asarray(max_cosine_similarity(pub, loc, tile_p=128, tile_l=64,
                                           interpret=True))
    expect = (pub @ loc.T).max(axis=1)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_max_cosine_similarity_padding_neutral():
    """Local padding replicates row 0; public padding rows are dropped."""
    rng = np.random.default_rng(1)
    pub = rng.standard_normal((130, 128)).astype(np.float32)
    loc = rng.standard_normal((65, 128)).astype(np.float32)
    pub /= np.linalg.norm(pub, axis=1, keepdims=True)
    loc /= np.linalg.norm(loc, axis=1, keepdims=True)
    out = np.asarray(max_cosine_similarity(pub, loc, tile_p=128, tile_l=64,
                                           interpret=True))
    assert out.shape == (130,)
    expect = (pub @ loc.T).max(axis=1)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_roc_histogram_kernel_matches_xla():
    """Fused Pallas ROC histogram (interpret mode) == XLA tiled scan,
    including padding, target masking, and the dead-bucket guard."""
    from fedfr_tpu.ops.pallas_kernels import roc_histogram
    from fedfr_tpu.ops.roc_histogram import pairwise_roc_histogram_device

    rng = np.random.default_rng(0)
    for n, ts in [(100, 37), (64, 64), (50, 3)]:
        f = rng.standard_normal((n, 16)).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        l = rng.integers(0, 7, n).astype(np.int32)
        a = np.asarray(roc_histogram(f, l, ts, tile_i=16, tile_j=32,
                                     interpret=True))
        b = np.asarray(pairwise_roc_histogram_device(
            f, l, ts, tile_i=16, tile_j=32))
        np.testing.assert_array_equal(a, b)
        assert a.sum() == ts * n - ts * (ts + 1) // 2 if ts <= n else True


def test_roc_histogram_empty_target_returns_zeros():
    """target_size == 0 (a client with no rows in the veri set) returns a
    zero histogram like the XLA paths instead of crashing on a 0-row
    operand slice."""
    from fedfr_tpu.ops.pallas_kernels import roc_histogram

    rng = np.random.default_rng(2)
    f = rng.standard_normal((40, 16)).astype(np.float32)
    l = rng.integers(0, 4, 40).astype(np.int32)
    out = np.asarray(roc_histogram(f, l, 0, tile_i=16, tile_j=32,
                                   interpret=True))
    assert out.shape == (2 * 2001,) and out.sum() == 0


def test_roc_histogram_non_lcm_tiles_match_xla():
    """Mismatched tile sizes pad to the tile_j cover, not lcm(tile_i,
    tile_j) (regression: lcm padding blew up 26x for coprime-ish tiles)."""
    from fedfr_tpu.ops.pallas_kernels import roc_histogram
    from fedfr_tpu.ops.roc_histogram import pairwise_roc_histogram_device

    rng = np.random.default_rng(3)
    n, ts = 100, 30
    f = rng.standard_normal((n, 16)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    l = rng.integers(0, 6, n).astype(np.int32)
    a = np.asarray(roc_histogram(f, l, ts, tile_i=14, tile_j=22,
                                 interpret=True))
    b = np.asarray(pairwise_roc_histogram_device(f, l, ts, tile_i=14,
                                                 tile_j=22))
    np.testing.assert_array_equal(a, b)
    assert a.sum() == ts * n - ts * (ts + 1) // 2


def test_sharded_pallas_histogram_matches_xla():
    """Per-shard Pallas kernel inside shard_map (interpret mode on the
    8-device CPU mesh) == the XLA sharded scan == the single-device scan."""
    from fedfr_tpu.ops.roc_histogram import (
        pairwise_roc_histogram_device,
        pairwise_roc_histogram_sharded,
    )
    from fedfr_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    n, e, ts = 128, 16, 40
    f = rng.standard_normal((n, e)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    l = rng.integers(0, 6, n).astype(np.int32)
    mesh = make_mesh((1, 8, 1))
    pallas = np.asarray(pairwise_roc_histogram_sharded(
        mesh, f, l, ts, tile_i=8, tile_j=8, use_pallas=True, interpret=True))
    xla = np.asarray(pairwise_roc_histogram_sharded(
        mesh, f, l, ts, tile_i=8, tile_j=8, use_pallas=False))
    single = np.asarray(pairwise_roc_histogram_device(
        f, l, ts, tile_i=8, tile_j=16))
    np.testing.assert_array_equal(pallas, xla)
    np.testing.assert_array_equal(pallas, single)
