"""Decompose the joint-objective train step's time on one TPU chip.

The production step (bench.py bench_train_step: sphere64, combined batch
256, 6100-row FC, BCE branch, MOON contrastive, momentum-SGD) runs at
MFU ~0.69.  This experiment times the step's constituent programs compiled
separately to show where the remaining time goes:

  * trainable forward only (the embedding kernel, MFU ~0.82 ceiling)
  * forward+backward of the joint loss (no frozen forwards, no SGD)
  * the two frozen contrastive forwards
  * the SGD update alone (param-sized elementwise, HBM-bound)

Parts overlap/fuse differently when compiled together, so the parts do NOT
sum exactly to the whole — the table is a map, not an accounting identity.

Usage: python experiments/trainstep_breakdown_tpu.py [--network sphnet]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def time_compiled(jax, fn, args, iters=4, donate=None):
    """Compile fn(*args) and time iters dispatches (device-data in, single
    end barrier out)."""
    jitted = jax.jit(fn, donate_argnums=donate or ())
    out = jitted(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(first[:1] if getattr(first, "ndim", 0) else first)
    t0 = time.perf_counter()
    outs = None
    for _ in range(iters):
        outs = jitted(*args)
    first = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(first[:1] if getattr(first, "ndim", 0) else first)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default="sphnet")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--n_local", type=int, default=100)
    ap.add_argument("--n_global", type=int, default=6000)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (validation without "
                         "touching the shared TPU)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import bench_train_step  # reuse cheap_init-style setup
    from fedfr_tpu.federated.state import normalize_images, train_preprocess
    from fedfr_tpu.federated.trainer import init_client_state, make_branch_train_step
    from fedfr_tpu.models import BCEModule, build_backbone
    from fedfr_tpu.ops.losses import bce_loss, moon_contrastive, softmax_cross_entropy
    from fedfr_tpu.ops.margins import MARGINS
    from fedfr_tpu.models.heads import cosine_logits
    from fedfr_tpu.utils.optim import sgd_init, sgd_update

    B, E = args.batch, args.embed
    n_local, n_global = args.n_local, args.n_global
    backbone = build_backbone(args.network, E, bf16=True, scan_blocks=True)
    bce = BCEModule(E, n_local)
    key = jax.random.PRNGKey(0)

    # variance-preserving cheap init (same recipe as bench.py)
    from bench import bench_train_step as _unused  # noqa: F401

    def cheap_init(shapes_tree):
        leaves, treedef = jax.tree_util.tree_flatten(shapes_tree)

        @jax.jit
        def make():
            ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
            out = []
            for k, s in zip(ks, leaves):
                if len(s.shape) >= 2:
                    fan_in = max(int(np.prod(s.shape[:-1])), 1)
                    v = (jax.random.normal(k, s.shape, jnp.float32)
                         / np.sqrt(fan_in)).astype(s.dtype)
                else:
                    v = jnp.full(s.shape, 0.25, s.dtype)
                out.append(v)
            return out

        return jax.tree_util.tree_unflatten(treedef, make())

    bvars = cheap_init(jax.eval_shape(
        lambda: backbone.init(key, jnp.zeros((1, 112, 112, 3)), train=False)))
    bce_vars = cheap_init(jax.eval_shape(
        bce.init, key, jnp.zeros((1, E)), jnp.zeros((1,), jnp.int32)))
    fc = jnp.full((n_local + n_global, E), 1e-2, jnp.float32)

    @jax.jit
    def make_inputs(k):
        imgs = jax.random.randint(k, (B, 112, 112, 3), 0, 255, jnp.uint8)
        labels = jax.random.randint(k, (B,), 0, n_local + n_global, jnp.int32)
        return imgs, labels
    imgs, labels = make_inputs(jax.random.PRNGKey(1))
    valid = jnp.ones((B,), bool)
    rng = jnp.asarray(jax.random.PRNGKey(2))
    margin_fn = MARGINS["CosFace"]

    report = {}

    # 1. trainable forward only (eval-mode embedding)
    def fwd(bvars, u8):
        return backbone.apply(bvars, normalize_images(u8), train=False)
    report["forward_ms"] = time_compiled(jax, fwd, (bvars, imgs))

    # 2. frozen contrastive forwards (two backbones, train=False)
    def frozen2(g, l, u8):
        x = normalize_images(u8)
        return (backbone.apply(g, x, train=False),
                backbone.apply(l, x, train=False))
    report["frozen_forwards_ms"] = time_compiled(jax, frozen2, (bvars, bvars, imgs))

    # 3. forward+backward of the joint loss, NO frozen forwards, NO sgd
    def loss_nofrozen(params, u8):
        x = train_preprocess(rng, u8)
        variables = {"params": params["backbone"]}
        if "batch_stats" in bvars:
            feats, _ = backbone.apply(dict(variables, batch_stats=bvars["batch_stats"]),
                                      x, train=True, mutable=["batch_stats"])
        else:
            feats = backbone.apply(variables, x, train=True)
        cos = cosine_logits(feats, params["fc"])
        cos_l = softmax_cross_entropy(margin_fn(cos, labels, 30.0, 0.4),
                                      labels, valid)
        bl, gts = bce.apply({"params": params["bce"]}, feats, labels)
        return cos_l + 10.0 * bce_loss(bl, gts, 30.0, 0.7, valid)
    params = {"backbone": bvars["params"], "fc": fc, "bce": bce_vars["params"]}
    report["fwd_bwd_no_frozen_ms"] = time_compiled(
        jax, jax.grad(loss_nofrozen), (params, imgs))

    # 4. SGD update alone
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    opt = sgd_init(params)
    def sgd_only(params, grads, opt):
        return sgd_update(params, grads, opt, jnp.float32(0.001), 0.9, 5e-4)
    report["sgd_update_ms"] = time_compiled(jax, sgd_only, (params, grads, opt))

    # 5. the full production step for reference
    state = init_client_state(
        jax.tree_util.tree_map(jnp.copy, bvars), fc, bce_vars)
    step = make_branch_train_step(backbone, bce, num_local=n_local,
                                  num_clients=40, jit=False)
    def full(state):
        return step(state, bvars, bvars, imgs, labels, valid,
                    jnp.float32(0.001), rng, jnp.int32(0))
    s, m = jax.jit(full)(state)
    np.asarray(m.loss)
    t0 = time.perf_counter()
    iters = 4
    cur = state
    jf = jax.jit(full)
    for _ in range(iters):
        cur, m = jf(cur)
    np.asarray(m.loss)
    report["full_step_ms"] = (time.perf_counter() - t0) / iters * 1e3

    report["network"] = args.network
    report["batch"] = B
    print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in report.items()}))


if __name__ == "__main__":
    main()
