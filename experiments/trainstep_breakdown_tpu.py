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


def time_compiled(jax, fn, args_list, donate=None):
    """Compile fn and time one dispatch per args-set (DISTINCT inputs per
    iteration — identical repeated dispatches can be served from an
    execution cache on this rig's transport; single end barrier)."""
    jitted = jax.jit(fn, donate_argnums=donate or ())
    out = jitted(*args_list[0])
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(first[:1] if getattr(first, "ndim", 0) else first)
    timed = args_list[1:]
    t0 = time.perf_counter()
    outs = None
    for args in timed:
        outs = jitted(*args)
    first = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(first[:1] if getattr(first, "ndim", 0) else first)
    return (time.perf_counter() - t0) / len(timed) * 1e3  # ms


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

    import functools

    from bench import cheap_init as _cheap_init
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

    cheap_init = functools.partial(_cheap_init, jax, jnp)

    bvars = cheap_init(jax.eval_shape(
        lambda: backbone.init(key, jnp.zeros((1, 112, 112, 3)), train=False)))
    bce_vars = cheap_init(jax.eval_shape(
        bce.init, key, jnp.zeros((1, E)), jnp.zeros((1,), jnp.int32)))
    fc = jnp.full((n_local + n_global, E), 1e-2, jnp.float32)

    ITERS = 4

    @jax.jit
    def make_inputs(k):
        imgs = jax.random.randint(k, (B, 112, 112, 3), 0, 255, jnp.uint8)
        labels = jax.random.randint(k, (B,), 0, n_local + n_global, jnp.int32)
        return imgs, labels
    inputs = [make_inputs(k)
              for k in jax.random.split(jax.random.PRNGKey(1), ITERS + 1)]
    imgs, labels = inputs[0]
    valid = jnp.ones((B,), bool)
    rng = jnp.asarray(jax.random.PRNGKey(2))
    margin_fn = MARGINS["CosFace"]

    report = {}

    # 1. trainable forward only (eval-mode embedding)
    def fwd(bvars, u8):
        return backbone.apply(bvars, normalize_images(u8), train=False)
    report["forward_ms"] = time_compiled(
        jax, fwd, [(bvars, u8) for u8, _ in inputs])

    # 2. frozen contrastive forwards (two backbones, train=False)
    def frozen2(g, l, u8):
        x = normalize_images(u8)
        return (backbone.apply(g, x, train=False),
                backbone.apply(l, x, train=False))
    report["frozen_forwards_ms"] = time_compiled(
        jax, frozen2, [(bvars, bvars, u8) for u8, _ in inputs])

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
        jax, jax.grad(loss_nofrozen), [(params, u8) for u8, _ in inputs])

    # 4. SGD update alone (distinct lr per iter -> distinct dispatches)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    opt = sgd_init(params)
    def sgd_only(params, grads, opt, lr):
        return sgd_update(params, grads, opt, lr, 0.9, 5e-4)
    report["sgd_update_ms"] = time_compiled(
        jax, sgd_only,
        [(params, grads, opt, jnp.float32(0.001) + 1e-6 * i)
         for i in range(ITERS + 1)])

    # 5. the full production step for reference
    state = init_client_state(
        jax.tree_util.tree_map(jnp.copy, bvars), fc, bce_vars)
    step = make_branch_train_step(backbone, bce, num_local=n_local,
                                  num_clients=40, jit=False)
    def full(state, u8, labels, step_no):
        return step(state, bvars, bvars, u8, labels, valid,
                    jnp.float32(0.001), rng, step_no)
    jf = jax.jit(full)
    cur, m = jf(state, *inputs[0], jnp.int32(0))
    np.asarray(m.loss)
    t0 = time.perf_counter()
    for i in range(ITERS):
        u8, lb = inputs[1 + i]
        cur, m = jf(cur, u8, lb, jnp.int32(1 + i))
    np.asarray(m.loss)
    report["full_step_ms"] = (time.perf_counter() - t0) / ITERS * 1e3

    # 6. N steps fused into ONE dispatch (lax.scan over stacked batches):
    # separates per-dispatch overhead (host enqueue through the tunneled
    # PJRT + launch gaps between dependent dispatches) from compute.  If
    # per-step time here drops materially below full_step_ms, the MFU
    # plateau is dispatch-bound, not MXU-bound — and a steps-per-dispatch
    # knob (viable with device-resident data) is the fix.  Lockstep K=2
    # measuring only +1.9% (DESIGN.md) already rules out batch
    # under-filling as the main cause.
    N_SCAN = 4

    def stacked(i0):
        pick = [inputs[(i0 + j) % len(inputs)] for j in range(N_SCAN)]
        return (jnp.stack([p[0] for p in pick]),
                jnp.stack([p[1] for p in pick]))

    def full_scan(state, su8, slb, step0):
        def body(st, xs):
            u8, lb, i = xs
            st, m = step(st, bvars, bvars, u8, lb, valid,
                         jnp.float32(0.001), rng, i)
            return st, m.loss
        steps = step0 + jnp.arange(N_SCAN, dtype=jnp.int32)
        return jax.lax.scan(body, state, (su8, slb, steps))

    jfs = jax.jit(full_scan)
    state2 = init_client_state(
        jax.tree_util.tree_map(jnp.copy, bvars), fc, bce_vars)
    # pre-stack OUTSIDE the timed loop (the 4x256-image device stack is a
    # ~150 MB copy that would otherwise pollute the per-step time)
    pre = [stacked(i) for i in range(ITERS + 1)]
    for su8, slb in pre:
        su8.block_until_ready()
    cur2, losses = jfs(state2, *pre[0], jnp.int32(0))
    np.asarray(losses[-1])
    t0 = time.perf_counter()
    for i in range(ITERS):
        cur2, losses = jfs(cur2, *pre[i + 1], jnp.int32(N_SCAN * (1 + i)))
    np.asarray(losses[-1])
    report["scan%d_per_step_ms" % N_SCAN] = (
        (time.perf_counter() - t0) / (ITERS * N_SCAN) * 1e3)

    report["network"] = args.network
    report["batch"] = B
    print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in report.items()}))


if __name__ == "__main__":
    main()
