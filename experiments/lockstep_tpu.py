"""Single-chip client-lockstep throughput (the --lockstep knob, measured).

The client-parallel round's vmapped step (parallel/client_parallel.py)
normally maps K clients onto K mesh slices.  With ``fed.lockstep > 1`` the
same executable stacks several clients PER slice — on one chip that means
K clients' convs batch into one XLA program (effective conv batch K*256).
This harness measures whether that batching beats K sequential dispatches
of the single-client step (reference hot loop client.py:355-404), at the
production shape: sphere64/E512, combined batch 256, 6100-class FC, BCE
branch, cached-contrastive MOON features.

Prints one JSON summary: per-K ms/step, aggregate imgs/s, and the speedup
vs K x the measured single-client step.

Run AFTER any live TPU experiment finishes — concurrent processes wedge
the single tunneled device (CLAUDE.md).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from bench import cheap_init  # noqa: E402  fan-in-scaled random weights
                              # (constant fills explode through the BN-free
                              # sphnet trunk -> NaN loss, see bench.py)


def bench_k(jax, jnp, K: int, iters: int = 4, n_cache: int = 16_384,
            network: str = "sphnet", E: int = 512, B: int = 256,
            img: int = 112, remat: bool = False):
    from fedfr_tpu.federated.trainer import init_client_state
    from fedfr_tpu.models import BCEModule, build_backbone
    from fedfr_tpu.parallel.client_parallel import make_parallel_branch_step

    n_local, n_global = 100, 6000
    backbone = build_backbone(network, E, bf16=True,
                              scan_blocks=(network != "toy"),
                              remat_blocks=remat)
    key = jax.random.PRNGKey(0)
    init = functools.partial(cheap_init, jax, jnp)

    bvars = init(jax.eval_shape(
        lambda: backbone.init(key, jnp.zeros((1, img, img, 3)), train=False)))
    bce = BCEModule(E, n_local)
    bce_vars = init(jax.eval_shape(
        bce.init, key, jnp.zeros((1, E)), jnp.zeros((1,), jnp.int32)))
    fc = jnp.full((n_local + n_global, E), 1e-2, jnp.float32)
    one = init_client_state(
        jax.tree_util.tree_map(jnp.copy, bvars), fc, bce_vars)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape).copy(), one)

    step = make_parallel_branch_step(
        backbone, bce, num_local=n_local, num_clients=40,
        cached_contrastive=True)

    g_cache = jnp.full((K, n_cache, 2, E), 1e-2, jnp.float32)
    l_cache = jnp.full((K, n_cache, 2, E), 2e-2, jnp.float32)
    valid = jnp.ones((K, B), bool)
    lr = jnp.float32(0.001)
    keys = jnp.stack([jnp.asarray(jax.random.PRNGKey(7 + c))
                      for c in range(K)])

    @jax.jit
    def make_inputs(key):
        imgs = jax.random.randint(key, (K, B, img, img, 3), 0, 255, jnp.uint8)
        labels = jax.random.randint(key, (K, B), 0, n_local + n_global,
                                    jnp.int32)
        idx = jax.random.randint(key, (K, B), 0, n_cache, jnp.int32)
        return imgs, labels, idx

    n_total = iters + 2
    inputs = [make_inputs(k)
              for k in jax.random.split(jax.random.PRNGKey(1), n_total)]
    # block_until_ready is NOT a reliable barrier on this rig's transport
    # (CLAUDE.md); device execution is in-order, so fetching one row of the
    # LAST dispatch's output barriers every pending input generation
    np.asarray(inputs[-1][0][0, 0, :1])

    def dispatch(state, n):
        imgs, labels, idx = inputs[n]
        return step(state, g_cache, l_cache, imgs, labels, valid,
                    idx, lr, keys, jnp.int32(n))

    t0 = time.perf_counter()
    for w in range(2):
        stacked, metrics = dispatch(stacked, w)
    np.asarray(metrics.loss)  # compile+warmup barrier
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for s in range(iters):
        stacked, metrics = dispatch(stacked, 2 + s)
    loss = np.asarray(metrics.loss)  # chained donated states -> barrier
    dt = time.perf_counter() - t0
    assert np.isfinite(loss).all()
    return {"K": K, "remat": remat, "ms_per_step": round(dt / iters * 1e3, 2),
            "imgs_per_sec": round(K * B * iters / dt, 1),
            "warmup_s": round(compile_s, 1)}


def main():
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()  # FEDFR_PLATFORM=cpu -> CPU smoke
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,2,4")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--n_cache", type=int, default=16_384)
    ap.add_argument("--network", default="sphnet")
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--image_size", type=int, default=112)
    ap.add_argument("--remat", action="store_true",
                    help="nn.remat residual blocks (the K=4 HBM-fit knob)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401

    results = []
    for k in [int(x) for x in args.ks.split(",")]:
        r = bench_k(jax, jnp, k, iters=args.iters, n_cache=args.n_cache,
                    network=args.network, E=args.embed, B=args.batch,
                    img=args.image_size, remat=args.remat)
        if results and results[0]["K"] == 1:
            r["speedup_vs_sequential"] = round(
                r["imgs_per_sec"] / results[0]["imgs_per_sec"], 3)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"lockstep": results}))


if __name__ == "__main__":
    main()
