"""Margin/loss parity tests against the reference torch implementations."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from fedfr_tpu.ops import (
    arcface,
    bce_loss,
    cosface,
    moon_contrastive,
    reweight_negatives,
    softmax_cross_entropy,
)
from fedfr_tpu.utils.optim import sgd_init, sgd_update, step_lr

from reference_oracle import load_module, skip_without_reference


def _rand_cos(rng, b, c):
    return (rng.random((b, c), dtype=np.float32) * 2 - 1) * 0.99


@skip_without_reference
def test_cosface_parity():
    ref = load_module("losses.py", "ref_losses")
    rng = np.random.default_rng(0)
    cos = _rand_cos(rng, 6, 10)
    label = np.array([0, 3, -1, 9, 2, -1])
    tout = ref.CosFace(s=30.0, m=0.4)(torch.from_numpy(cos.copy()),
                                      torch.from_numpy(label)).numpy()
    jout = cosface(jnp.asarray(cos), jnp.asarray(label), 30.0, 0.4)
    np.testing.assert_allclose(np.asarray(jout), tout, atol=1e-5)


@skip_without_reference
def test_arcface_parity():
    ref = load_module("losses.py", "ref_losses")
    rng = np.random.default_rng(1)
    cos = _rand_cos(rng, 5, 8)
    label = np.array([1, -1, 7, 0, 4])
    tout = ref.ArcFace(s=64.0, m=0.5)(torch.from_numpy(cos.copy()),
                                      torch.from_numpy(label)).numpy()
    jout = arcface(jnp.asarray(cos), jnp.asarray(label), 64.0, 0.5)
    np.testing.assert_allclose(np.asarray(jout), tout, atol=1e-4)


@skip_without_reference
def test_bce_loss_parity():
    ref = load_module("losses.py", "ref_losses")
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((4, 7), dtype=np.float32) * 20
    gt = rng.random((4, 7)) > 0.8
    tout = ref.BCE_loss()(torch.from_numpy(logits.copy()),
                          torch.from_numpy(gt)).item()
    jout = bce_loss(jnp.asarray(logits), jnp.asarray(gt))
    np.testing.assert_allclose(float(jout), tout, rtol=1e-5)


def test_softmax_ce_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((6, 11), dtype=np.float32)
    label = rng.integers(0, 11, 6)
    tout = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(label)).item()
    jout = softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(label))
    np.testing.assert_allclose(float(jout), tout, rtol=1e-6)


def test_moon_contrastive_matches_torch():
    rng = np.random.default_rng(4)
    z = rng.standard_normal((5, 16), dtype=np.float32)
    zg = rng.standard_normal((5, 16), dtype=np.float32)
    zl = rng.standard_normal((5, 16), dtype=np.float32)
    T = 0.5
    crit = torch.nn.CosineSimilarity(dim=1)
    pos = crit(torch.from_numpy(z), torch.from_numpy(zg)) / T
    neg = crit(torch.from_numpy(z), torch.from_numpy(zl)) / T
    tout = F.cross_entropy(torch.stack([pos, neg], dim=1),
                           torch.zeros(5, dtype=torch.long)).item()
    jout = moon_contrastive(jnp.asarray(z), jnp.asarray(zg), jnp.asarray(zl), T)
    np.testing.assert_allclose(float(jout), tout, rtol=1e-5)


def test_reweight_negatives_layout():
    """Replicates client.py:269-285: target column removed, first num_local
    columns repeated (num_clients-1) times, appended."""
    logits = jnp.arange(12, dtype=jnp.float32).reshape(2, 6)
    label = jnp.array([1, 0])
    out = reweight_negatives(logits, label, num_local=3, num_clients=3)
    assert out.shape == (2, 6 + 3 * 2)
    np.testing.assert_array_equal(np.asarray(out[0, 6:9]), [0.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(out[1, 6:9]), [7.0, 8.0, 9.0])
    np.testing.assert_array_equal(np.asarray(out[0, 9:12]), [0.0, 2.0, 3.0])


def test_masked_losses_ignore_padded_rows():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((4, 7), dtype=np.float32))
    label = jnp.array([0, 1, 2, 3])
    valid = jnp.array([True, True, True, False])
    full = softmax_cross_entropy(logits[:3], label[:3])
    masked = softmax_cross_entropy(logits, label, valid)
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_sgd_matches_torch():
    rng = np.random.default_rng(6)
    p0 = rng.standard_normal((5, 3), dtype=np.float32)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, weight_decay=5e-4)
    params = {"w": jnp.asarray(p0)}
    state = sgd_init(params)
    for i in range(3):
        g = rng.standard_normal((5, 3), dtype=np.float32)
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        params, state = sgd_update(params, {"w": jnp.asarray(g)}, state, 0.1)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               atol=1e-6)


def test_step_lr():
    assert step_lr(1.0, 0, 8) == 1.0
    assert step_lr(1.0, 7, 8) == 1.0
    np.testing.assert_allclose(step_lr(1.0, 8, 8), 0.1)
    np.testing.assert_allclose(step_lr(1.0, 16, 8), 0.01)
