"""End-to-end gradient parity of the full FedFR joint objective vs torch.

Builds the reference training graph out of the reference's own modules
(sphere20 backbone, FC_module, BCE_module, CosFace, BCE_loss, the MOON
contrastive term of client.py:372-375) with weights converted from a single
flax initialization, computes loss + gradients for one fixed batch in both
frameworks, and compares every gradient family.  This certifies the entire
differentiation path of the rebuild — backbone, cosine FC, margin, BCE
branch, contrastive — in one shot.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from fedfr_tpu.models import BCEModule, SphNet, cosine_logits
from fedfr_tpu.ops import bce_loss, cosface, moon_contrastive, softmax_cross_entropy
from fedfr_tpu.utils import torch_interop as ti

from reference_oracle import load_class_source, load_module, skip_without_reference


@skip_without_reference
def test_full_objective_gradients_match_reference():
    ref_sph = load_module("backbones/sphnet.py", "ref_sphnet_gp")
    ref_losses = load_module("losses.py", "ref_losses_gp")
    ns = {"torch": torch, "nn": torch.nn, "F": F, "BottleBlock": None}
    RefBCE = load_class_source("client.py", "BCE_module", ns)
    RefFC = load_class_source("client.py", "FC_module", ns)

    torch.manual_seed(0)
    n_local, n_global, E = 5, 7, 512
    B = 6

    # ---- torch side -----------------------------------------------------
    tbackbone = ref_sph.sphere(20).train()  # sphnet has no BN/dropout: train==eval
    tfc = RefFC(E, n_local + n_global, "/tmp")
    tbce = RefBCE(E, n_local, converter_layer=1)
    tglobal = ref_sph.sphere(20)
    tlast = ref_sph.sphere(20)
    torch.manual_seed(1)
    for m in (tglobal, tlast):
        for p in m.parameters():
            p.data.normal_(0, 0.05)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 3, 112, 112)).astype(np.float32) * 0.2
    labels = np.array([0, 3, 4, 6, 9, 11])  # mix of local + "public" labels

    tx = torch.from_numpy(x.copy())
    tlabels = torch.from_numpy(labels)
    feats = tbackbone(tx)
    cos = tfc(feats)
    logits = ref_losses.CosFace(s=30.0, m=0.4)(cos, tlabels)
    cos_l = F.cross_entropy(logits, tlabels)
    bce_logits, gts = tbce(feats, tlabels)
    bce_l = ref_losses.BCE_loss()(bce_logits, gts)
    with torch.no_grad():
        gfeats = tglobal(tx)
        lfeats = tlast(tx)
    crit = torch.nn.CosineSimilarity(dim=1)
    pos = crit(feats, gfeats) / 0.5
    neg = crit(feats, lfeats) / 0.5
    con_l = F.cross_entropy(torch.stack([pos, neg], dim=1),
                            torch.zeros(B, dtype=torch.long))
    tloss = cos_l + 10.0 * bce_l + 5.0 * con_l
    tloss.backward()

    # ---- jax side (converted weights) -----------------------------------
    backbone = SphNet(depth=20, bf16=False)
    bvars = ti.sphnet_from_torch(tbackbone.state_dict(), depth=20)
    gvars = ti.sphnet_from_torch(tglobal.state_dict(), depth=20)
    lvars = ti.sphnet_from_torch(tlast.state_dict(), depth=20)
    bce = BCEModule(hidden=E, n_class=n_local)
    bce_vars = ti.bce_from_torch(tbce.state_dict(), converter_layers=1)
    fc0 = jnp.asarray(tfc.fc.data.numpy())

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    jlabels = jnp.asarray(labels)

    def loss_fn(params):
        feats = backbone.apply({"params": params["backbone"]}, jx, train=True)
        cos = cosine_logits(feats, params["fc"])
        logits = cosface(cos, jlabels, 30.0, 0.4)
        cos_l = softmax_cross_entropy(logits, jlabels)
        blogits, gt = bce.apply({"params": params["bce"]}, feats, jlabels)
        bce_l = bce_loss(blogits, gt)
        gfeats = backbone.apply(gvars, jx, train=False)
        lfeats = backbone.apply(lvars, jx, train=False)
        con_l = moon_contrastive(feats, gfeats, lfeats, 0.5)
        return cos_l + 10.0 * bce_l + 5.0 * con_l, (cos_l, bce_l, con_l)

    params = {"backbone": bvars["params"], "fc": fc0,
              "bce": bce_vars["params"]}
    (jloss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    # loss parity
    np.testing.assert_allclose(float(jloss), float(tloss.detach()), rtol=2e-4)
    np.testing.assert_allclose(float(parts[0]), float(cos_l.detach()), rtol=2e-4)
    np.testing.assert_allclose(float(parts[1]), float(bce_l.detach()), rtol=2e-3)
    np.testing.assert_allclose(float(parts[2]), float(con_l.detach()), rtol=2e-4)

    def cmp(jg, tg, name, atol):
        jg = np.asarray(jg, dtype=np.float64).reshape(-1)
        tg = tg.detach().numpy().astype(np.float64).reshape(-1)
        scale = max(np.abs(tg).max(), 1e-8)
        # elementwise within atol*scale except a tiny reassociation tail, and
        # near-perfect correlation overall
        frac_bad = float(np.mean(np.abs(jg - tg) > atol * scale))
        corr = float(np.dot(jg, tg) / max(np.linalg.norm(jg) * np.linalg.norm(tg), 1e-30))
        assert frac_bad < 1e-3, (name, frac_bad)
        assert corr > 0.9999, (name, corr)

    # FC gradient
    cmp(grads["fc"], tfc.fc.grad, "fc", 1e-3)
    # BCE weight/bias/converter gradients
    cmp(grads["bce"]["weight"], tbce.weight.grad, "bce.weight", 1e-3)
    cmp(grads["bce"]["bias"], tbce.bias.grad, "bce.bias", 1e-3)
    cmp(grads["bce"]["converter"]["dense"]["kernel"].T,
        tbce.converter[0].weight.grad, "bce.converter", 1e-3)
    # backbone: first conv, a middle block conv, and the embedding fc
    cmp(np.transpose(np.asarray(grads["backbone"]["layer1_conv"]["kernel"]),
                     (3, 2, 0, 1)),
        tbackbone.layer1[0].weight.grad, "layer1.conv", 5e-3)
    cmp(np.transpose(np.asarray(
        grads["backbone"]["layer3_block0"]["conv1"]["kernel"]), (3, 2, 0, 1)),
        tbackbone.layer3[2].conv1.weight.grad, "layer3.block0.conv1", 5e-3)
    jfc = np.asarray(grads["backbone"]["fc"]["kernel"])  # (25088, 512) HWC-in
    jfc_t = jfc.reshape(7, 7, 512, 512).transpose(3, 2, 0, 1).reshape(512, -1)
    cmp(jfc_t, tbackbone.fc.weight.grad, "embed.fc", 5e-3)


@skip_without_reference
def test_multistep_trajectory_matches_reference():
    """TWO EPOCHS of the full local-training integration — SGD momentum +
    weight decay + StepLR decay at the epoch boundary, driving the jitted
    branch step — track the reference's own torch training loop
    (client.py:335-404: SGD(momentum .9, wd), StepLR(train_decay, 0.1),
    fixed global/last contrastive models) step for step.  The single-step
    test above certifies one gradient; this one certifies that integration
    error does not compound over a run.

    Flip-invariant inputs (horizontally symmetric images) make the jitted
    step's RandomHorizontalFlip a no-op so both frameworks consume
    identical pixels without disabling the production preprocessing path.
    """
    from fedfr_tpu.federated.trainer import (
        init_client_state,
        make_branch_train_step,
    )
    from fedfr_tpu.utils.optim import step_lr

    ref_sph = load_module("backbones/sphnet.py", "ref_sphnet_traj")
    ref_losses = load_module("losses.py", "ref_losses_traj")
    ns = {"torch": torch, "nn": torch.nn, "F": F, "BottleBlock": None}
    RefBCE = load_class_source("client.py", "BCE_module", ns)
    RefFC = load_class_source("client.py", "FC_module", ns)

    torch.manual_seed(0)
    n_local, n_global, E = 5, 7, 512
    B, steps_per_epoch, epochs = 4, 3, 2
    lr0, train_decay = 0.01, 1  # decay fires at the epoch boundary

    tbackbone = ref_sph.sphere(20).train()
    tfc = RefFC(E, n_local + n_global, "/tmp")
    tbce = RefBCE(E, n_local, converter_layer=1)
    tglobal = ref_sph.sphere(20)
    tlast = ref_sph.sphere(20)
    torch.manual_seed(1)
    for m in (tglobal, tlast):
        for p in m.parameters():
            p.data.normal_(0, 0.05)

    # flip-symmetric uint8 batches: x == x[..., ::-1 on W, :]
    rng = np.random.default_rng(42)
    batches = []
    for s in range(steps_per_epoch * epochs):
        half = rng.integers(0, 256, (B, 112, 56, 3), dtype=np.uint8)
        u8 = np.concatenate([half, half[:, :, ::-1]], axis=2)
        labels = rng.integers(0, n_local + n_global, B).astype(np.int32)
        batches.append((u8, labels))

    # ---- torch: the reference's loop verbatim ---------------------------
    opt = torch.optim.SGD(
        list(tbackbone.parameters()) + list(tfc.parameters())
        + list(tbce.parameters()), lr=lr0, momentum=0.9, weight_decay=5e-4)
    schler = torch.optim.lr_scheduler.StepLR(opt, train_decay, gamma=0.1)
    crit = torch.nn.CosineSimilarity(dim=1)
    tlosses = []
    for epoch in range(epochs):
        for s in range(steps_per_epoch):
            u8, labels = batches[epoch * steps_per_epoch + s]
            x = torch.from_numpy(np.ascontiguousarray(
                u8.transpose(0, 3, 1, 2).astype(np.float32) / 127.5 - 1.0))
            tl = torch.from_numpy(labels.astype(np.int64))
            opt.zero_grad()
            feats = tbackbone(x)
            with torch.no_grad():
                gfeats = tglobal(x)
                lfeats = tlast(x)
            cos = ref_losses.CosFace(s=30.0, m=0.4)(tfc(feats), tl)
            cos_l = F.cross_entropy(cos, tl)
            blogits, gts = tbce(feats, tl)
            bce_l = ref_losses.BCE_loss()(blogits, gts)
            pos = crit(feats, gfeats) / 0.5
            neg = crit(feats, lfeats) / 0.5
            con_l = F.cross_entropy(torch.stack([pos, neg], dim=1),
                                    torch.zeros(B, dtype=torch.long))
            loss = cos_l + 10.0 * bce_l + 5.0 * con_l
            loss.backward()
            opt.step()
            tlosses.append(float(loss.detach()))
        schler.step()

    # ---- jax: the production jitted step --------------------------------
    backbone = SphNet(depth=20, bf16=False)
    bvars = ti.sphnet_from_torch(tglobal.state_dict(), depth=20)  # template
    # convert the INITIAL torch weights (before training they were consumed
    # above, so rebuild from a fresh torch graph with the same seed)
    torch.manual_seed(0)
    tb0 = ref_sph.sphere(20)
    tfc0 = RefFC(E, n_local + n_global, "/tmp")
    tbce0 = RefBCE(E, n_local, converter_layer=1)
    bvars = ti.sphnet_from_torch(tb0.state_dict(), depth=20)
    gvars = ti.sphnet_from_torch(tglobal.state_dict(), depth=20)
    lvars = ti.sphnet_from_torch(tlast.state_dict(), depth=20)
    bce = BCEModule(hidden=E, n_class=n_local)
    bce_vars = ti.bce_from_torch(tbce0.state_dict(), converter_layers=1)
    fc0 = jnp.asarray(tfc0.fc.data.numpy())

    step = make_branch_train_step(backbone, bce, margin="CosFace", s=30.0,
                                  m=0.4, mu=5.0, momentum=0.9,
                                  weight_decay=5e-4, contrastive=True,
                                  num_local=n_local, donate=False)
    state = init_client_state(bvars, fc0, bce_vars)
    key = jnp.asarray(jax.random.PRNGKey(3))
    valid = jnp.ones((B,), bool)
    jlosses = []
    n = 0
    for epoch in range(epochs):
        lr = step_lr(lr0, epoch, train_decay, 0.1)
        for s in range(steps_per_epoch):
            u8, labels = batches[epoch * steps_per_epoch + s]
            state, metrics = step(state, gvars, lvars, jnp.asarray(u8),
                                  jnp.asarray(labels), valid,
                                  jnp.float32(lr), key, n)
            jlosses.append(float(metrics.loss))
            n += 1

    # per-step loss trajectory (fp32 compounding over 6 SGD steps)
    np.testing.assert_allclose(jlosses, tlosses, rtol=3e-3)
    # the trajectories must actually move (guard against a frozen run)
    assert abs(tlosses[-1] - tlosses[0]) > 1e-3

    # final parameters track after the full integration
    def close(j, t, name, tol=2e-3):
        j = np.asarray(j, np.float64).reshape(-1)
        t = t.detach().numpy().astype(np.float64).reshape(-1)
        scale = max(np.abs(t).max(), 1e-8)
        assert float(np.abs(j - t).max()) < tol * scale, name
        corr = float(np.dot(j, t)
                     / max(np.linalg.norm(j) * np.linalg.norm(t), 1e-30))
        assert corr > 0.99999, (name, corr)

    close(state.fc, tfc.fc, "fc")
    close(state.bce["params"]["weight"], tbce.weight, "bce.weight")
    close(np.transpose(
        np.asarray(state.backbone["params"]["layer1_conv"]["kernel"]),
        (3, 2, 0, 1)), tbackbone.layer1[0].weight, "layer1.conv")
    jfc = np.asarray(state.backbone["params"]["fc"]["kernel"])
    jfc_t = jfc.reshape(7, 7, 512, 512).transpose(3, 2, 0, 1).reshape(512, -1)
    close(jfc_t, tbackbone.fc.weight, "embed.fc")


@skip_without_reference
def test_round_boundary_matches_reference():
    """ONE FEDERATED ROUND, one level up from the trajectory test: two
    clients with different data (and dataset sizes) locally train a BN
    backbone (iresnet18) from the same global state — the reference's plain
    local loop (Client.train, client.py:511-571: Sequential(backbone, FC),
    CosFace, SGD momentum+wd) — and the server aggregates with FedPavg over
    EVERY state entry including BN running statistics, weighted by dataset
    size (server.py:25-34, 322-338), plus FedAvg_on_FC (server.py:36-47).
    Asserts the jax client step + streaming_weighted_average + fedavg_on_fc
    reproduce the post-round global parameters AND running stats.  BN stats
    make this a real round-boundary test: they only match if
    TorchBatchNorm's Bessel-corrected running fold matches torch through
    training and the aggregation averages the stats leaves exactly like
    params.  Batches are fed in a fixed shared order (loader order is an
    implementation detail; the round semantics are the test)."""
    import copy

    from fedfr_tpu.federated.trainer import (
        init_client_state,
        make_plain_train_step,
    )
    from fedfr_tpu.models import IResNet
    from fedfr_tpu.parallel.fedavg import (
        fedavg_on_fc,
        streaming_weighted_average,
    )

    from reference_oracle import load_function_source

    ref_ires = load_module("backbones/iresnet.py", "ref_iresnet_round")
    ref_losses = load_module("losses.py", "ref_losses_round")
    ns = {"torch": torch, "nn": torch.nn, "F": F, "BottleBlock": None}
    RefFC = load_class_source("client.py", "FC_module", ns)
    FedPavg = load_function_source("server.py", "FedPavg",
                                   {"torch": torch, "copy": copy})
    FedAvg_on_FC = load_function_source("server.py", "FedAvg_on_FC",
                                        {"torch": torch, "copy": copy})

    n_local, E, B = 5, 64, 4
    lr = 0.01
    steps_per_client = [2, 3]          # different dataset sizes -> real
    sizes = [s * B for s in steps_per_client]  # weighted (not plain) average

    torch.manual_seed(0)
    global_t = ref_ires.iresnet18(False, num_features=E)
    tfc0 = RefFC(E, n_local, "/tmp")
    global_sd = copy.deepcopy(global_t.state_dict())
    fc0_t = tfc0.fc.data.clone()

    # flip-symmetric uint8 batches per client (neutralizes the jitted
    # step's RandomHorizontalFlip without leaving the production path)
    rng = np.random.default_rng(7)
    batches = []
    for c, n_steps in enumerate(steps_per_client):
        bs = []
        for s in range(n_steps):
            half = rng.integers(0, 256, (B, 112, 56, 3), dtype=np.uint8)
            u8 = np.concatenate([half, half[:, :, ::-1]], axis=2)
            labels = rng.integers(0, n_local, B).astype(np.int32)
            bs.append((u8, labels))
        batches.append(bs)

    # ---- torch: per-client reference loop, then reference aggregation ----
    crit = ref_losses.CosFace(s=30.0, m=0.4)
    t_states, t_fcs = [], []
    for c, bs in enumerate(batches):
        tb = ref_ires.iresnet18(False, num_features=E)
        tb.load_state_dict(copy.deepcopy(global_sd))
        tb.train()
        tfc = RefFC(E, n_local, "/tmp")
        tfc.fc.data = fc0_t.clone()
        opt = torch.optim.SGD(
            list(tb.parameters()) + list(tfc.parameters()), lr=lr,
            momentum=0.9, weight_decay=5e-4)
        for u8, labels in bs:
            x = torch.from_numpy(np.ascontiguousarray(
                u8.transpose(0, 3, 1, 2).astype(np.float32) / 127.5 - 1.0))
            tl = torch.from_numpy(labels.astype(np.int64))
            opt.zero_grad()
            logits = crit(tfc(tb(x)), tl)
            F.cross_entropy(logits, tl).backward()
            opt.step()
        t_states.append(tb.state_dict())
        t_fcs.append(tfc.fc.data.clone())
    agg_sd = FedPavg(t_states, list(sizes))
    agg_fc_full = FedAvg_on_FC(fc0_t.clone(), t_fcs, list(sizes), p=1.0)
    agg_fc_part = FedAvg_on_FC(fc0_t.clone(), t_fcs, list(sizes), p=0.3)

    # ---- jax: production step + the server's aggregation path ------------
    backbone = IResNet(depth=18, embedding_size=E, bf16=False)
    gvars = ti.iresnet_from_torch(global_sd, depth=18)
    step = make_plain_train_step(backbone, margin="CosFace", s=30.0, m=0.4,
                                 momentum=0.9, weight_decay=5e-4,
                                 donate=False)
    key = jnp.asarray(jax.random.PRNGKey(11))
    valid = jnp.ones((B,), bool)
    models, fcs = [], []
    for c, bs in enumerate(batches):
        state = init_client_state(
            jax.tree_util.tree_map(jnp.array, gvars),
            jnp.asarray(fc0_t.numpy()))
        for n, (u8, labels) in enumerate(bs):
            state, _ = step(state, jnp.asarray(u8), jnp.asarray(labels),
                            valid, jnp.float32(lr), key, n)
        models.append(state.backbone)
        fcs.append(state.fc)
    aggregated = streaming_weighted_average(
        models, jnp.asarray(sizes, jnp.float32))
    j_sd = ti.iresnet_to_torch(aggregated, depth=18)

    def close(j, t, name, tol=2e-3, ref=None):
        """Error measured against the round's UPDATE magnitude when ``ref``
        (the pre-round value) is given: backbone gradients carry a ~0.3%
        f32 reassociation tail (same bar as the gradient tests above), so
        post-round params differ by ~that fraction of lr*grad, not of the
        parameter value.  Absolute floor 1e-5: a leaf whose whole-round
        update is ~1e-8 (e.g. a bn bias under weight decay at equilibrium)
        would otherwise demand agreement below fp32 accumulation noise."""
        j = np.asarray(j, np.float64).reshape(-1)
        t = np.asarray(t, np.float64).reshape(-1)
        scale = max(np.abs(t).max(), 1e-8)
        if ref is not None:
            upd = float(np.abs(t - np.asarray(ref, np.float64).reshape(-1)).max())
            scale = max(min(scale, upd), 1e-5)
        assert float(np.abs(j - t).max()) < tol * scale, name

    checked = 0
    for k, v in agg_sd.items():
        if k.endswith("num_batches_tracked"):
            continue  # torch bookkeeping; no flax equivalent by design
        assert k in j_sd, k
        if k.endswith("running_mean") or k.endswith("running_var"):
            # forward-path quantities, but after step 1 the activations
            # feeding them sit on params that already carry the gradient
            # reassociation tail, so stats drift with depth — up to ~6e-4
            # relative at the final embedding BN (batch-only stats, n=B).
            # 2e-3 still falsifies a wrong momentum or fold order (errors
            # ~1e-1) and a missing Bessel correction at the feature BN
            # (n=B -> ~33%); Bessel exactness for every n is proven at
            # module level by test_models.py's TorchBatchNorm oracle test.
            d = float(np.abs(np.asarray(j_sd[k], np.float64)
                             - v.numpy().astype(np.float64)).max())
            assert d < 2e-3 * max(float(np.abs(v.numpy()).max()), 1e-2), k
        else:
            close(j_sd[k], v.numpy(), k, tol=0.03,
                  ref=global_sd[k].numpy())
        checked += 1
    assert checked > 60  # params + BN stats of every layer actually compared
    # the round must actually have moved the globals
    assert not np.allclose(agg_sd["conv1.weight"].numpy(),
                           global_sd["conv1.weight"].numpy())
    # BN running stats moved and matched (the Bessel-fold surface)
    assert not np.allclose(agg_sd["bn1.running_var"].numpy(),
                           global_sd["bn1.running_var"].numpy())

    j_fc_full = fedavg_on_fc(jnp.asarray(fc0_t.numpy()),
                             jnp.stack(fcs), jnp.asarray(sizes, jnp.float32),
                             p=1.0)
    j_fc_part = fedavg_on_fc(jnp.asarray(fc0_t.numpy()),
                             jnp.stack(fcs), jnp.asarray(sizes, jnp.float32),
                             p=0.3)
    close(j_fc_full, agg_fc_full.numpy(), "fc_avg_p1")
    close(j_fc_part, agg_fc_part.numpy(), "fc_avg_p0.3")
