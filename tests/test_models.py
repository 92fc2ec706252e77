"""Backbone/head construction, shape, and torch-parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fedfr_tpu.models import BCEModule, SphNet, IResNet, build_backbone, cosine_logits
from fedfr_tpu.utils import torch_interop as ti

from reference_oracle import load_module, load_class_source, skip_without_reference


def _init_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model.apply(variables, x, train=train,
                       mutable=["batch_stats"] if train else False), variables


def test_sphnet_shapes():
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    model = SphNet(depth=20, bf16=False)
    (out), variables = _init_apply(model, x)
    assert out.shape == (2, 512)
    assert out.dtype == jnp.float32


def test_iresnet_shapes_and_batchstats():
    x = jnp.ones((2, 112, 112, 3), jnp.float32)
    model = IResNet(depth=18, bf16=False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 512)
    # train step must update running statistics
    old = variables["batch_stats"]["bn1"]["mean"]
    new = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(old, new)


def test_factory():
    assert isinstance(build_backbone("sphnet"), SphNet)
    assert isinstance(build_backbone("iresnet50"), IResNet)
    with pytest.raises(ValueError):
        build_backbone("vit")


def test_bce_module_basic():
    model = BCEModule(hidden=16, n_class=5)
    x = jnp.ones((4, 16))
    labels = jnp.array([0, 2, 5, 7])  # labels >= n_class -> no positive
    variables = model.init(jax.random.PRNGKey(0), x, labels)
    logits, gt = model.apply(variables, x, labels)
    assert logits.shape == (4, 5)
    assert gt[0, 0] and gt[1, 2]
    assert not gt[2].any() and not gt[3].any()
    # identity converter at init: convert(x) == x
    conv = model.apply(variables, x, method=model.convert)
    np.testing.assert_allclose(np.asarray(conv), np.asarray(x), atol=1e-6)


@skip_without_reference
def test_sphnet_parity_with_reference():
    import torch

    ref = load_module("backbones/sphnet.py", "ref_sphnet")
    torch.manual_seed(0)
    tmodel = ref.sphere(20).eval()
    variables = ti.sphnet_from_torch(tmodel.state_dict(), depth=20)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 112, 112), dtype=np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x)).numpy()

    model = SphNet(depth=20, bf16=False)
    jout = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4, rtol=1e-3)


@skip_without_reference
def test_iresnet_parity_with_reference():
    import torch

    ref = load_module("backbones/iresnet.py", "ref_iresnet")
    torch.manual_seed(0)
    tmodel = ref.iresnet18(False).eval()
    variables = ti.iresnet_from_torch(tmodel.state_dict(), depth=18)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 112, 112), dtype=np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x)).numpy()

    model = IResNet(depth=18, bf16=False)
    jout = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4, rtol=1e-3)


@skip_without_reference
def test_sphnet_to_torch_roundtrip():
    import torch

    ref = load_module("backbones/sphnet.py", "ref_sphnet2")
    torch.manual_seed(3)
    tmodel = ref.sphere(20).eval()
    variables = ti.sphnet_from_torch(tmodel.state_dict(), depth=20)
    sd_back = ti.sphnet_to_torch(variables, depth=20)
    for k, v in tmodel.state_dict().items():
        np.testing.assert_allclose(sd_back[k].numpy(), v.numpy(), atol=1e-6, err_msg=k)


@skip_without_reference
def test_bce_module_parity_with_reference():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    ns = {"torch": torch, "nn": tnn, "F": F, "BottleBlock": None}
    RefBCE = load_class_source("client.py", "BCE_module", ns)
    torch.manual_seed(0)
    tmod = RefBCE(32, 6, converter_layer=1).eval()
    variables = ti.bce_from_torch(tmod.state_dict(), converter_layers=1)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 32), dtype=np.float32)
    labels = np.array([0, 3, 5, 6, 9])
    with torch.no_grad():
        tlogits, tgt = tmod(torch.from_numpy(x), torch.from_numpy(labels))

    model = BCEModule(hidden=32, n_class=6)
    jlogits, jgt = model.apply(variables, jnp.asarray(x), jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(jgt), tgt.numpy())
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(), atol=1e-4, rtol=1e-4)


@skip_without_reference
def test_cosine_fc_parity_with_reference():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    ns = {"torch": torch, "nn": tnn, "F": F}
    RefFC = load_class_source("client.py", "FC_module", ns)
    torch.manual_seed(1)
    tmod = RefFC(16, 4, "/tmp")
    weight = tmod.fc.data.numpy()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 16), dtype=np.float32)
    with torch.no_grad():
        tout = tmod(torch.from_numpy(x)).numpy()
    jout = cosine_logits(jnp.asarray(x), jnp.asarray(weight))
    np.testing.assert_allclose(np.asarray(jout), tout, atol=1e-5, rtol=1e-5)


def test_sphnet_scan_blocks_matches_unrolled():
    """nn.scan'd sphere blocks produce identical outputs to the unrolled net."""
    from fedfr_tpu.utils.torch_interop import sphnet_scan_params, sphnet_unscan_params

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 112, 112, 3)).astype(np.float32))
    unrolled = SphNet(depth=20, bf16=False)
    variables = unrolled.init(jax.random.PRNGKey(0), x, train=False)
    out_a = unrolled.apply(variables, x, train=False)

    scanned = SphNet(depth=20, bf16=False, scan_blocks=True)
    scan_vars = {"params": sphnet_scan_params(
        jax.device_get(variables["params"]), depth=20)}
    out_b = scanned.apply(scan_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)

    # structure roundtrip
    back = sphnet_unscan_params(scan_vars["params"], depth=20)
    for k, v in jax.device_get(variables["params"]).items():
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(v),
                                  jax.tree_util.tree_leaves(back[k])):
            np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))


def test_iresnet_scan_blocks_matches_unrolled():
    from fedfr_tpu.utils.torch_interop import (
        iresnet_scan_variables, iresnet_unscan_variables)

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 112, 112, 3)).astype(np.float32))
    unrolled = IResNet(depth=18, bf16=False)
    variables = jax.device_get(unrolled.init(jax.random.PRNGKey(0), x, train=False))
    out_a = unrolled.apply(variables, x, train=False)

    scanned = IResNet(depth=18, bf16=False, scan_blocks=True)
    scan_vars = iresnet_scan_variables(variables, depth=18)
    out_b = scanned.apply(scan_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)

    # train-mode batch_stats update works under scan
    out_c, mutated = scanned.apply(scan_vars, x, train=True,
                                   mutable=["batch_stats"])
    assert out_c.shape == (2, 512)
    back = iresnet_unscan_variables(
        {"batch_stats": mutated["batch_stats"]}, depth=18)["batch_stats"]
    assert "layer1_block1" in back

    # structure roundtrip
    rt = iresnet_unscan_variables(scan_vars, depth=18)
    for coll in variables:
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(variables[coll]),
                                  jax.tree_util.tree_leaves(rt[coll])):
            np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))


def test_flops_counter_scan_invariant_and_analytic():
    """utils/flops.py: jaxpr FLOP walk is scan-trip-count aware (scan and
    unrolled variants count identically — XLA's executable cost_analysis
    counts a scan body once, ~6x low for sphere64) and matches hand math."""
    import jax.numpy as jnp

    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.utils.flops import count_flops

    # analytic check: one dense layer = 2*B*In*Out
    def dense(w, x):
        return x @ w

    got = count_flops(dense, jnp.zeros((32, 64)), jnp.zeros((8, 32)))
    assert got == 2 * 8 * 32 * 64

    # scan == unrolled on a real multi-block backbone
    counts = {}
    for scan in (True, False):
        bb = build_backbone("sphnet20", 64, bf16=False, scan_blocks=scan)
        v = jax.eval_shape(lambda: bb.init(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 112, 112, 3)),
                                           train=False))
        v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
        counts[scan] = count_flops(
            lambda vv, u8: bb.apply(vv, u8, train=False), v,
            jnp.zeros((4, 112, 112, 3), jnp.float32))
    assert counts[True] == counts[False]
    assert counts[True] > 4 * 1e9  # sphere20 is multi-GFLOP per batch of 4


@skip_without_reference
def test_batchnorm_running_stats_parity_with_torch():
    """TorchBatchNorm folds the UNBIASED batch variance into the running
    average exactly like torch.nn.BatchNorm (reference backbones train-mode
    BN, iresnet.py:37-42); flax's nn.BatchNorm folds the biased one.  FedFR
    aggregates running stats across clients (reference server.py:25-33), so
    the running buffers — not just the normalized output — must match."""
    import torch

    from fedfr_tpu.models.layers import TorchBatchNorm

    rng = np.random.default_rng(0)
    tbn = torch.nn.BatchNorm1d(16, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(
            rng.normal(1.0, 0.1, 16).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(
            rng.normal(0.0, 0.1, 16).astype(np.float32)))
    tbn.train()

    jbn = TorchBatchNorm(use_running_average=False, momentum=0.9)
    x0 = rng.normal(size=(7, 16)).astype(np.float32)
    variables = jbn.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"],
    }

    for step in range(3):
        x = rng.normal(loc=step, scale=1.0 + step,
                       size=(7, 16)).astype(np.float32)
        want = tbn(torch.from_numpy(x)).detach().numpy()
        got, mutated = jbn.apply(variables, jnp.asarray(x),
                                 mutable=["batch_stats"])
        variables = {"params": variables["params"], **mutated}
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-6, atol=2e-6)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-6, atol=1e-7)

    # flax's nn.BatchNorm would FAIL the var check (biased fold): the two
    # rules differ by n/(n-1) = 7/6 on each update — assert the gap is real
    # so this test can't silently pass on a biased implementation.
    from flax import linen as fnn
    fbn = fnn.BatchNorm(use_running_average=False, momentum=0.9,
                        epsilon=1e-5)
    fv = {"params": variables["params"],
          "batch_stats": {"mean": jnp.zeros(16), "var": jnp.ones(16)}}
    _, fm = fbn.apply(fv, jnp.asarray(x0), mutable=["batch_stats"])
    _, jm = jbn.apply({"params": variables["params"],
                       "batch_stats": {"mean": jnp.zeros(16),
                                       "var": jnp.ones(16)}},
                      jnp.asarray(x0), mutable=["batch_stats"])
    assert not np.allclose(np.asarray(fm["batch_stats"]["var"]),
                           np.asarray(jm["batch_stats"]["var"]), rtol=1e-3)


def test_remat_blocks_is_numerically_transparent():
    """remat_blocks must not change the model's math: identical forward
    outputs, identical BN batch_stats updates, and gradients equal up to
    recompute reassociation.  It only changes the backward's memory/FLOPs
    schedule (the --lockstep K=4 HBM-fit knob, DESIGN.md)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 112, 112, 3), jnp.float32)

    for name, scan in [("sphnet20", True), ("iresnet18", True),
                       ("iresnet18", False)]:
        base = build_backbone(name, 64, bf16=False, scan_blocks=scan)
        remat = build_backbone(name, 64, bf16=False, scan_blocks=scan,
                               remat_blocks=True)
        variables = base.init(key, x, train=False)

        np.testing.assert_array_equal(
            np.asarray(base.apply(variables, x, train=False)),
            np.asarray(remat.apply(variables, x, train=False)))

        has_bn = "batch_stats" in variables

        def loss(params, mod):
            v = {"params": params}
            if has_bn:
                v["batch_stats"] = variables["batch_stats"]
                f, upd = mod.apply(v, x, train=True,
                                   mutable=["batch_stats"])
                return jnp.mean(f ** 2), upd["batch_stats"]
            return jnp.mean(mod.apply(v, x, train=True) ** 2), None

        (la, bs_a), ga = jax.value_and_grad(loss, has_aux=True)(
            variables["params"], base)
        (lb, bs_b), gb = jax.value_and_grad(loss, has_aux=True)(
            variables["params"], remat)
        # remat'd programs compile differently (prevent_cse) so fp32
        # reductions may reassociate even in the primal — noise-level only
        assert abs(float(la) - float(lb)) < 1e-6 * abs(float(la))
        if has_bn:  # stats fold through the remat'd forward up to
            # reduction-reassociation noise (observed ~1e-8)
            for sa, sb in zip(jax.tree_util.tree_leaves(bs_a),
                              jax.tree_util.tree_leaves(bs_b)):
                np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                           rtol=1e-4, atol=1e-6)
        for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            # recompute may reassociate BN reductions (observed up to ~4e-5
            # relative through deep BN chains); bound relative to the
            # gradient's own scale — a genuine math change errs at O(1)
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), atol=1e-5 +
                1e-4 * float(np.abs(np.asarray(pa)).max()))
