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
