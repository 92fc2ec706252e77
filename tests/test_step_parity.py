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
