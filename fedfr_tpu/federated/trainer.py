"""Jitted local-training steps for the FedFR objective.

Pure functions ``(state, batch, lr, rng) -> (state', metrics)`` compiled once
and reused across every client and round (static shapes: the combined batch
size, FC row count, and image size are fixed per configuration).

The branch step reproduces the reference hot loop (client.py:355-404):

    loss = CE(margin(cos_logits), labels)
         + 10 * BCE(transformation-layer logits)
         + mu * MOON-contrastive(feats; global model, last-round model)

with SGD(momentum 0.9, wd 5e-4) over backbone+FC+BCE jointly, and BatchNorm
batch_stats updated functionally in the same step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.heads import cosine_logits
from ..ops.losses import bce_loss, moon_contrastive, softmax_cross_entropy
from ..ops.margins import MARGINS, reweight_negatives
from ..utils.optim import sgd_init, sgd_update
from .state import (ClientTrainState, apply_hflip, flip_mask,
                    normalize_images, train_preprocess)


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    cos_loss: jnp.ndarray
    bce_loss: jnp.ndarray
    con_loss: jnp.ndarray


_warned_cache_fallback = False


def use_cached_contrastive(cfg) -> bool:
    """One predicate for every build/call site of the cached-contrastive
    step (client, server sequential round, client-parallel round), so they
    can never disagree on the step signature."""
    active = bool(cfg.fed.cache_contrastive and cfg.fed.contrastive
                  and cfg.fed.fedprox_mu == 0.0)
    global _warned_cache_fallback
    if cfg.fed.cache_contrastive and not active and not _warned_cache_fallback:
        _warned_cache_fallback = True
        import logging

        logging.getLogger("fedfr_tpu.trainer").warning(
            "cache_contrastive requested but falling back to per-step "
            "recompute: %s", "contrastive is disabled"
            if not cfg.fed.contrastive
            else "fedprox_mu > 0 needs the global tree inside the step")
    return active


def _apply_backbone(backbone, variables, x, train: bool, dropout_rng=None):
    """Run the backbone; returns (feats, new_variables).

    ``dropout_rng`` feeds stochastic layers (iresnet's pre-embedding
    Dropout) on the trainable forward; flax ignores unused rng streams, so
    supplying it is a no-op for dropout-free models (sphnet) and at
    dropout=0 (the module isn't even constructed, models/iresnet.py).
    """
    rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) \
        else None
    if train and "batch_stats" in variables:
        feats, mutated = backbone.apply(variables, x, train=True,
                                        mutable=["batch_stats"], rngs=rngs)
        new_vars = dict(variables, batch_stats=mutated["batch_stats"])
        return feats, new_vars
    if train and rngs is not None:
        return backbone.apply(variables, x, train=True, rngs=rngs), variables
    feats = backbone.apply(variables, x, train=False)
    return feats, variables


def make_branch_train_step(backbone, bce_module, *, margin: str = "CosFace",
                           s: float = 30.0, m: float = 0.4,
                           bce_weight: float = 10.0, bce_r: float = 30.0,
                           bce_lambda: float = 0.7, mu: float = 5.0,
                           temperature: float = 0.5, momentum: float = 0.9,
                           weight_decay: float = 5e-4, bce_detach: bool = False,
                           contrastive: bool = True, reweight: bool = False,
                           num_local: int = 100, num_clients: int = 40,
                           fedprox_mu: float = 0.0,
                           cached_contrastive: bool = False,
                           donate: bool = True, jit: bool = True) -> Callable:
    """Train step for the joint local+public objective with the BCE branch.

    ``jit=False`` returns the raw step body (used by the client-parallel
    vmapped trainer, parallel/client_parallel.py).

    ``fedprox_mu`` > 0 adds the FedProx proximal term
    mu/2 * ||w - w_global||^2 over the backbone parameters.  The reference
    accepts --aggr_alg FedProx but never applies the proximal penalty
    (server.py:327 treats it as FedAvg); here it is implemented.

    ``cached_contrastive`` swaps the two frozen MOON forwards (~38% of the
    step's time, DESIGN.md "Performance notes") for gathers into per-round
    feature caches: both frozen models are fixed for the whole local run and
    run in eval mode (reference client.py:327-329 ``.eval()`` under
    ``no_grad``), so their per-(image, flip) features are precomputable at
    full embedding MFU.  The step then takes ``(state, g_cache, l_cache,
    images_u8, labels, valid, idx, lr, rng, step_no)`` with caches of shape
    (N, 2, E) — axis 1 is [original, h-flipped] — and ``idx`` the batch's
    dataset positions; it recomputes the augmentation flip mask from the
    same fold_in(rng, step_no) key, so the gathered features correspond to
    the EXACT augmented images the trainable forward sees.
    """
    margin_fn = MARGINS[margin]
    if cached_contrastive and not contrastive:
        raise ValueError("cached_contrastive requires contrastive=True")
    if cached_contrastive and fedprox_mu > 0.0:
        raise ValueError(
            "cached_contrastive drops the global variable tree from the "
            "step; the FedProx proximal term needs it — disable one")

    def _run(state: ClientTrainState, x, con_feats, prox_vars, labels,
             valid, lr, dropout_rng=None):
        def loss_fn(train_params, batch_stats):
            variables = {"params": train_params["backbone"]}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            feats, new_vars = _apply_backbone(backbone, variables, x,
                                              train=True,
                                              dropout_rng=dropout_rng)

            cos = cosine_logits(feats, train_params["fc"])
            logits = margin_fn(cos, labels, s, m)
            if reweight:
                logits = reweight_negatives(logits, labels, num_local, num_clients)
            cos_l = softmax_cross_entropy(logits, labels, valid)

            if "bce" in train_params:
                bce_feats = jax.lax.stop_gradient(feats) if bce_detach else feats
                bce_logits, gts = bce_module.apply(
                    {"params": train_params["bce"]}, bce_feats, labels)
                bce_l = bce_loss(bce_logits, gts, bce_r, bce_lambda, valid)
            else:  # joint objective without the BCE branch (reference
                # client.py:320,383 guards the term on self.BCE_local)
                bce_l = jnp.zeros(())

            if contrastive:
                gfeats, lfeats = con_feats()
                con_l = moon_contrastive(feats, gfeats, lfeats, temperature, valid)
            else:
                con_l = jnp.zeros(())

            total = cos_l + bce_weight * bce_l + mu * con_l
            if fedprox_mu > 0.0:
                sq = jax.tree_util.tree_map(
                    lambda p, g: jnp.sum((p - jax.lax.stop_gradient(g)) ** 2),
                    train_params["backbone"], prox_vars["params"])
                total = total + 0.5 * fedprox_mu * sum(
                    jax.tree_util.tree_leaves(sq))
            aux = (new_vars.get("batch_stats"), StepMetrics(total, cos_l, bce_l, con_l))
            return total, aux

        train_params = {"backbone": state.backbone["params"], "fc": state.fc}
        if state.bce is not None:
            train_params["bce"] = state.bce["params"]
        bs = state.backbone.get("batch_stats")
        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(train_params, bs)
        new_params, new_opt = sgd_update(train_params, grads, state.opt, lr,
                                         momentum, weight_decay)
        new_backbone = {"params": new_params["backbone"]}
        if new_bs is not None:
            new_backbone["batch_stats"] = new_bs
        new_state = ClientTrainState(
            backbone=new_backbone, fc=new_params["fc"],
            bce={"params": new_params["bce"]} if "bce" in new_params else None,
            opt=new_opt)
        return new_state, metrics

    def step(state: ClientTrainState, global_vars, last_vars,
             images_u8, labels, valid, lr, rng, step_no):
        # per-step key derived INSIDE jit from (client base key, step counter)
        # so the sequential loop and the client-parallel vmapped loop consume
        # identical randomness (parallel == sequential parity) and no host
        # key-split dispatch happens per step
        base = jax.random.fold_in(rng, step_no)
        x = train_preprocess(base, images_u8)

        def con_feats():
            gfeats, _ = _apply_backbone(backbone, global_vars, x, train=False)
            lfeats, _ = _apply_backbone(backbone, last_vars, x, train=False)
            return gfeats, lfeats

        return _run(state, x, con_feats, global_vars, labels, valid, lr,
                    dropout_rng=jax.random.fold_in(base, 1))

    def cached_step(state: ClientTrainState, g_cache, l_cache,
                    images_u8, labels, valid, idx, lr, rng, step_no):
        base = jax.random.fold_in(rng, step_no)
        flip = flip_mask(base, images_u8.shape[0])
        x = normalize_images(apply_hflip(flip, images_u8))
        fi = flip.astype(jnp.int32)

        def con_feats():
            return g_cache[idx, fi], l_cache[idx, fi]

        return _run(state, x, con_feats, None, labels, valid, lr,
                    dropout_rng=jax.random.fold_in(base, 1))

    chosen = cached_step if cached_contrastive else step
    if not jit:
        return chosen
    return jax.jit(chosen, donate_argnums=(0,) if donate else ())


def make_plain_train_step(backbone, *, margin: str = "CosFace", s: float = 30.0,
                          m: float = 0.4, momentum: float = 0.9,
                          weight_decay: float = 5e-4, reweight: bool = False,
                          num_local: int = 100, num_clients: int = 40,
                          donate: bool = True, jit: bool = True) -> Callable:
    """CosFace-only local training (reference Client.train, client.py:511-571)."""
    margin_fn = MARGINS[margin]

    def step(state: ClientTrainState, images_u8, labels, valid, lr, rng, step_no):
        base = jax.random.fold_in(rng, step_no)
        x = train_preprocess(base, images_u8)
        dropout_rng = jax.random.fold_in(base, 1)

        def loss_fn(train_params, batch_stats):
            variables = {"params": train_params["backbone"]}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            feats, new_vars = _apply_backbone(backbone, variables, x,
                                              train=True,
                                              dropout_rng=dropout_rng)
            cos = cosine_logits(feats, train_params["fc"])
            logits = margin_fn(cos, labels, s, m)
            if reweight:
                logits = reweight_negatives(logits, labels, num_local, num_clients)
            loss = softmax_cross_entropy(logits, labels, valid)
            return loss, new_vars.get("batch_stats")

        train_params = {"backbone": state.backbone["params"], "fc": state.fc}
        bs = state.backbone.get("batch_stats")
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(train_params, bs)
        new_params, new_opt = sgd_update(train_params, grads, state.opt, lr,
                                         momentum, weight_decay)
        new_backbone = {"params": new_params["backbone"]}
        if new_bs is not None:
            new_backbone["batch_stats"] = new_bs
        new_state = ClientTrainState(backbone=new_backbone, fc=new_params["fc"],
                                     bce=state.bce, opt=new_opt)
        return new_state, loss

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def init_client_state(backbone_vars: Dict[str, Any], fc: jnp.ndarray,
                      bce_vars: Optional[Dict[str, Any]] = None) -> ClientTrainState:
    """Fresh optimizer buffers around existing module variables."""
    trainable = {"backbone": backbone_vars["params"], "fc": fc}
    if bce_vars is not None:
        trainable["bce"] = bce_vars["params"]
    return ClientTrainState(backbone=backbone_vars, fc=fc, bce=bce_vars,
                            opt=sgd_init(trainable))
