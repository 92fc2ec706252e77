"""Partial FC sharding, FedAvg, SpreadOut tests on a virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from fedfr_tpu.models.heads import l2_normalize
from fedfr_tpu.ops import cosface, softmax_cross_entropy
from fedfr_tpu.parallel import (
    fed_weighted_average,
    fedavg_on_fc,
    make_mesh,
    model_mesh,
    pad_classes,
    partial_fc_loss,
    sampled_partial_fc_loss,
    spreadout,
    stack_trees,
    unstack_tree,
)


def _reference_full_loss(features, labels, weight, s=30.0, m=0.4):
    cos = jnp.dot(l2_normalize(features), l2_normalize(weight).T)
    logits = cosface(cos, labels, s, m)
    return softmax_cross_entropy(logits, labels)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("client", "data", "model")
    mm = model_mesh()
    assert mm.shape["model"] == 8


def test_partial_fc_matches_full_softmax():
    mesh = model_mesh()
    rng = np.random.default_rng(0)
    B, C, E = 16, 24, 32  # C divisible by 8 shards
    feats = jnp.asarray(rng.standard_normal((B, E), dtype=np.float32))
    weight = jnp.asarray(rng.standard_normal((C, E), dtype=np.float32) * 0.01)
    labels = jnp.asarray(rng.integers(0, C, B, dtype=np.int32))

    loss_fn = partial_fc_loss(mesh, "CosFace", 30.0, 0.4)
    sharded = jax.jit(loss_fn)(feats, labels, weight)
    dense = _reference_full_loss(feats, labels, weight)
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-5)


def test_partial_fc_gradients_match_dense():
    mesh = model_mesh()
    rng = np.random.default_rng(1)
    B, C, E = 16, 24, 8
    feats = jnp.asarray(rng.standard_normal((B, E), dtype=np.float32))
    weight = jnp.asarray(rng.standard_normal((C, E), dtype=np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, C, B, dtype=np.int32))

    loss_fn = partial_fc_loss(mesh, "CosFace", 30.0, 0.4)
    gf_s, gw_s = jax.jit(jax.grad(loss_fn, argnums=(0, 2)))(feats, labels, weight)
    gf_d, gw_d = jax.grad(
        lambda f, w: _reference_full_loss(f, labels, w), argnums=(0, 1))(feats, weight)
    np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gf_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_d), atol=1e-5)


def test_partial_fc_with_padded_classes():
    mesh = model_mesh()
    rng = np.random.default_rng(2)
    B, C, E = 16, 21, 8  # 21 classes -> pad to 24 over 8 shards
    feats = jnp.asarray(rng.standard_normal((B, E), dtype=np.float32))
    weight = jnp.asarray(rng.standard_normal((C, E), dtype=np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, C, B, dtype=np.int32))

    padded, num_valid = pad_classes(weight, 8)
    assert padded.shape[0] == 24 and num_valid == 21
    loss_fn = partial_fc_loss(mesh, "CosFace", 30.0, 0.4, num_valid=num_valid)
    sharded = jax.jit(loss_fn)(feats, labels, padded)
    dense = _reference_full_loss(feats, labels, weight)
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-5)


def test_partial_fc_ignores_invalid_labels():
    mesh = model_mesh()
    rng = np.random.default_rng(3)
    B, C, E = 16, 16, 8
    feats = jnp.asarray(rng.standard_normal((B, E), dtype=np.float32))
    weight = jnp.asarray(rng.standard_normal((C, E), dtype=np.float32) * 0.1)
    labels = np.asarray(rng.integers(0, C, B, dtype=np.int32))
    labels[3] = -1
    labels[9] = -1
    loss_fn = partial_fc_loss(mesh)
    sharded = jax.jit(loss_fn)(feats, jnp.asarray(labels), weight)
    keep = labels >= 0
    dense = _reference_full_loss(feats[keep], jnp.asarray(labels[keep]), weight)
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-5)


def test_sampled_partial_fc_full_rate_matches_dense():
    mesh = model_mesh()
    rng = np.random.default_rng(4)
    B, C, E = 16, 24, 8
    feats = jnp.asarray(rng.standard_normal((B, E), dtype=np.float32))
    weight = jnp.asarray(rng.standard_normal((C, E), dtype=np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, C, B, dtype=np.int32))
    # num_sample == num_local: sampling must degenerate to the full softmax
    loss_fn = sampled_partial_fc_loss(mesh, num_sample=C // 8)
    sharded = jax.jit(loss_fn)(jax.random.PRNGKey(0), feats, labels, weight)
    dense = _reference_full_loss(feats, labels, weight)
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-5)


def test_sampled_partial_fc_partial_rate_runs_and_keeps_positives():
    mesh = model_mesh()
    rng = np.random.default_rng(5)
    B, C, E = 16, 64, 8
    feats = jnp.asarray(rng.standard_normal((B, E), dtype=np.float32))
    weight = jnp.asarray(rng.standard_normal((C, E), dtype=np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, C, B, dtype=np.int32))
    loss_fn = sampled_partial_fc_loss(mesh, num_sample=4)  # 4 of 8 per shard
    loss = jax.jit(loss_fn)(jax.random.PRNGKey(1), feats, labels, weight)
    assert np.isfinite(float(loss))
    g = jax.jit(jax.grad(loss_fn, argnums=3))(jax.random.PRNGKey(1), feats, labels, weight)
    # rows never sampled get zero gradient
    row_norms = np.linalg.norm(np.asarray(g), axis=1)
    assert (row_norms == 0).sum() >= C - 8 * 4 - B


def test_fed_weighted_average_matches_reference_math():
    rng = np.random.default_rng(6)
    trees = [{"w": jnp.asarray(rng.standard_normal((3, 4), dtype=np.float32)),
              "bn": {"mean": jnp.asarray(rng.standard_normal(4, dtype=np.float32))}}
             for _ in range(3)]
    weights = jnp.asarray([10.0, 30.0, 60.0])
    stacked = stack_trees(trees)
    avg = fed_weighted_average(stacked, weights)
    expect = sum(float(w) / 100.0 * np.asarray(t["w"]) for w, t in zip(weights, trees))
    np.testing.assert_allclose(np.asarray(avg["w"]), expect, rtol=1e-5)
    # running stats are averaged exactly like weights (server.py:29-33)
    expect_bn = sum(float(w) / 100.0 * np.asarray(t["bn"]["mean"]) for w, t in zip(weights, trees))
    np.testing.assert_allclose(np.asarray(avg["bn"]["mean"]), expect_bn, rtol=1e-5)
    back = unstack_tree(stacked, 3)
    np.testing.assert_array_equal(np.asarray(back[1]["w"]), np.asarray(trees[1]["w"]))


def test_streaming_fedavg_matches_stacked():
    """The HBM-bounded incremental aggregation (server production path)
    equals stack-then-average (reference FedPavg math, server.py:25-34)."""
    from fedfr_tpu.parallel.fedavg import streaming_weighted_average

    rng = np.random.default_rng(0)
    trees = [{"w": rng.standard_normal((5, 7)).astype(np.float32),
              "bn": {"mean": rng.standard_normal(11).astype(np.float32)}}
             for _ in range(6)]
    w = np.array([3, 1, 4, 1, 5, 9], np.float32)
    stacked = fed_weighted_average(
        stack_trees([jax.tree_util.tree_map(jnp.asarray, t) for t in trees]),
        jnp.asarray(w))
    streamed = streaming_weighted_average(trees, w)
    for a, b in zip(jax.tree_util.tree_leaves(stacked),
                    jax.tree_util.tree_leaves(streamed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-7)


def test_fedavg_on_fc_interpolation():
    rng = np.random.default_rng(7)
    pre = jnp.asarray(rng.standard_normal((5, 4), dtype=np.float32))
    stack = jnp.asarray(rng.standard_normal((2, 5, 4), dtype=np.float32))
    w = jnp.asarray([1.0, 3.0])
    full = fedavg_on_fc(pre, stack, w, p=1.0)
    expect = 0.25 * np.asarray(stack[0]) + 0.75 * np.asarray(stack[1])
    np.testing.assert_allclose(np.asarray(full), expect, rtol=1e-5)
    half = fedavg_on_fc(pre, stack, w, p=0.5)
    np.testing.assert_allclose(np.asarray(half), 0.5 * np.asarray(pre) + 0.5 * expect,
                               rtol=1e-5)


def test_spreadout_matches_torch_sgd():
    """Independent torch-autograd oracle of the SpreadOut objective
    (server.py:48-63 math, momentum-SGD with weight decay)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(8)
    fc0 = rng.standard_normal((12, 6), dtype=np.float32)

    tfc = torch.nn.Parameter(torch.from_numpy(fc0.copy()))
    opt = torch.optim.SGD([tfc], lr=0.01, momentum=0.9, weight_decay=5e-4)
    n = fc0.shape[0]
    eye = torch.eye(n, dtype=torch.bool)
    for _ in range(5):
        opt.zero_grad()
        fcn = F.normalize(tfc)
        sim = fcn @ fcn.t()
        loss = torch.mean(F.relu(sim.masked_select(~eye) - 0.4) ** 2)
        loss.backward()
        opt.step()

    out = spreadout(jnp.asarray(fc0), margin=0.4, iters=5, lr=0.01,
                    momentum=0.9, weight_decay=5e-4, mode="mean")
    np.testing.assert_allclose(np.asarray(out), tfc.detach().numpy(), atol=2e-5)


def test_spreadout_reduces_similarity():
    rng = np.random.default_rng(9)
    base = rng.standard_normal((1, 8)).astype(np.float32)
    fc = np.repeat(base, 10, axis=0) + 0.01 * rng.standard_normal((10, 8)).astype(np.float32)
    before = np.asarray(jnp.dot(jnp.asarray(fc), jnp.asarray(fc).T))
    out = np.asarray(spreadout(jnp.asarray(fc), margin=0.4, iters=50, lr=0.05))
    outn = out / np.linalg.norm(out, axis=1, keepdims=True)
    fcn = fc / np.linalg.norm(fc, axis=1, keepdims=True)
    sim_before = (fcn @ fcn.T)[~np.eye(10, dtype=bool)].mean()
    sim_after = (outn @ outn.T)[~np.eye(10, dtype=bool)].mean()
    assert sim_after < sim_before


def test_multislice_mesh_orders_devices_slice_major():
    """Simulated 2-slice deployment on the 8 virtual CPU devices: the client
    axis must enumerate slice-major (contiguous client groups per slice) so
    FedAvg reduces over ICI first and crosses DCN once (mesh.py make_mesh)."""
    devices = jax.devices()
    # interleaved slice assignment: even ids -> slice 0, odd ids -> slice 1
    mesh = make_mesh(slice_of=lambda d: d.id % 2)
    order = [d.id for d in mesh.devices.reshape(-1)]
    assert order == [0, 2, 4, 6, 1, 3, 5, 7]
    assert mesh.shape["client"] == 8

    # the reordered mesh computes the same FedAvg as the plain one
    from fedfr_tpu.parallel.client_parallel import (
        parallel_fedavg,
        shard_stacked_tree,
    )

    rng = np.random.default_rng(4)
    stacked = {"w": jnp.asarray(rng.standard_normal((8, 5, 3), np.float32)),
               "b": jnp.asarray(rng.standard_normal((8, 3), np.float32))}
    weights = jnp.asarray(rng.random(8).astype(np.float32) + 0.1)
    expect = fed_weighted_average(stacked, weights)

    with jax.set_mesh(mesh):
        sharded = shard_stacked_tree(mesh, stacked)
        got = parallel_fedavg(sharded, shard_stacked_tree(mesh, weights))
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(expect["w"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["b"]), np.asarray(expect["b"]),
                               rtol=1e-6)


def test_multislice_mesh_rejects_uneven_slices():
    import pytest

    with pytest.raises(ValueError):
        make_mesh(slice_of=lambda d: 0 if d.id < 3 else 1)


def test_sampled_partial_fc_padded_rows_never_trained():
    """pad_classes rows must not be sampled, enter the softmax, or receive
    gradient (regression: the sampled variant ignored num_valid)."""
    mesh = model_mesh()
    rng = np.random.default_rng(6)
    B, C, E = 16, 20, 8  # pads to 24 over 8 shards
    feats = jnp.asarray(rng.standard_normal((B, E), dtype=np.float32))
    weight = jnp.asarray(rng.standard_normal((C, E), dtype=np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, C, B, dtype=np.int32))
    padded, num_valid = pad_classes(weight, 8)
    assert padded.shape[0] == 24 and num_valid == C

    loss_fn = sampled_partial_fc_loss(mesh, num_sample=2, num_valid=num_valid)
    loss, g = jax.jit(jax.value_and_grad(loss_fn, argnums=3))(
        jax.random.PRNGKey(2), feats, labels, padded)
    assert np.isfinite(float(loss))
    g = np.asarray(g)
    assert np.all(g[C:] == 0), "padded rows received gradient"

    # full-rate sampling over the padded weight still matches the dense loss
    full_fn = sampled_partial_fc_loss(mesh, num_sample=3, num_valid=num_valid)
    full = jax.jit(full_fn)(jax.random.PRNGKey(2), feats, labels, padded)
    dense = _reference_full_loss(feats, labels, weight)
    np.testing.assert_allclose(float(full), float(dense), rtol=1e-5)


def test_sampled_partial_fc_positive_overflow_rows_masked():
    """More distinct positive classes on a shard than num_sample: overflow
    rows are excluded from the loss instead of trained toward a wrong class
    (the reference falls back to a dynamic positives-only sample,
    partial_fc.py:96-101 — impossible with static shapes)."""
    mesh = model_mesh()
    rng = np.random.default_rng(7)
    B, C, E = 16, 24, 8  # c_local = 3
    feats = jnp.asarray(rng.standard_normal((B, E), dtype=np.float32))
    weight = jnp.asarray(rng.standard_normal((C, E), dtype=np.float32) * 0.1)
    # shard 0 owns classes {0,1,2}: make all three positive -> one must drop
    labels = np.full(B, -1, np.int32)
    labels[:3] = [0, 1, 2]
    labels[3:] = rng.integers(12, C, B - 3)
    labels = jnp.asarray(labels)

    loss_fn = sampled_partial_fc_loss(mesh, num_sample=2)
    loss = jax.jit(loss_fn)(jax.random.PRNGKey(3), feats, labels, weight)
    assert np.isfinite(float(loss))

    # ties at score 2.0 resolve to the lowest indices (lax.top_k stable):
    # class 2's row is the dropped positive -> masking it by hand must give
    # the identical loss
    masked = np.asarray(labels).copy()
    masked[2] = -1
    expect = jax.jit(loss_fn)(jax.random.PRNGKey(3), feats,
                              jnp.asarray(masked), weight)
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-6)
