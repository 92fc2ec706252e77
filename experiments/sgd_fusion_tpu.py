"""Measure the SGD-update tail of the train step: per-leaf vs flat-ravel.

The train-step decomposition (DESIGN.md "Performance notes") charges ~8.5 ms
to the momentum-SGD update — one small XLA fusion per parameter leaf
(sphere64: 130 leaves, 74 of them tiny), suspected dispatch/fusion-count
overhead rather than bandwidth (the update moves ~1.6 GB at 819 GB/s ~ 2 ms).

This experiment times, on the real chip:
  1. the standalone per-leaf update (current utils/optim.py::sgd_update);
  2. a flat-ravel variant: ravel params/grads/momentum into one vector,
     one fused elementwise update, unravel — trades ~1 GB of extra copies
     for a single fusion (identical elementwise math);
  3. the FULL cached-contrastive train step with each variant, which is the
     number that matters (inside one program XLA may already overlap the
     per-leaf fusions with the backward).

If flat wins inside the full step, productionize it behind the same
SGDState layout (ravel/unravel inside sgd_update keeps checkpoints and
callers unchanged).
"""

import json
import time

import numpy as np


def time_dispatches(fn, args_list, get_probe):
    """Median wall time per dispatch; one end-of-stream device_get barrier
    (block_until_ready is unreliable on this transport, CLAUDE.md)."""
    out = None
    for a in args_list[:2]:  # warmup
        out = fn(*a)
    np.asarray(get_probe(out))
    t0 = time.perf_counter()
    for a in args_list[2:]:
        out = fn(*a)
    np.asarray(get_probe(out))
    return (time.perf_counter() - t0) / (len(args_list) - 2)


def main():
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    jax.config.update("jax_compilation_cache_dir", "/tmp/fedfr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import bench_train_step, cheap_init
    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.utils.optim import SGDState, sgd_init, sgd_update

    backbone = build_backbone("sphnet", 512, bf16=True, scan_blocks=True)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: backbone.init(key, jnp.zeros((1, 112, 112, 3)), train=False))
    params = cheap_init(jax, jnp, shapes)["params"]
    _, unravel = ravel_pytree(params)

    def flat_sgd(params, grads, buf_tree, lr, momentum=0.9, wd=5e-4):
        p, _ = ravel_pytree(params)
        g, _ = ravel_pytree(grads)
        b, _ = ravel_pytree(buf_tree)
        g = g + wd * p
        b = momentum * b + g
        return unravel(p - lr * b), unravel(b)

    n = 8
    # distinct grads per dispatch (execution-cache safe), generated on device
    @jax.jit
    def make_grads(k):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        ks = jax.random.split(k, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [jax.random.normal(kk, l.shape, l.dtype) * 1e-3
                      for kk, l in zip(ks, leaves)])

    grads_list = [make_grads(k)
                  for k in jax.random.split(jax.random.PRNGKey(1), n)]
    for g in grads_list:
        jax.tree_util.tree_leaves(g)[0].block_until_ready()
    buf = sgd_init(params).momentum
    lr = jnp.float32(1e-3)

    leaf = jax.jit(lambda p, g, b, lr: sgd_update(p, g, SGDState(b), lr))
    flat = jax.jit(flat_sgd)

    # exactness: identical elementwise math
    (p1, s1) = leaf(params, grads_list[0], buf, lr)
    (p2, b2) = flat(params, grads_list[0], buf, lr)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    t_leaf = time_dispatches(
        lambda g: leaf(params, g, buf, lr), [(g,) for g in grads_list],
        lambda out: jax.tree_util.tree_leaves(out[0])[0][:1])
    t_flat = time_dispatches(
        lambda g: flat(params, g, buf, lr), [(g,) for g in grads_list],
        lambda out: jax.tree_util.tree_leaves(out[0])[0][:1])

    print(json.dumps({
        "standalone_ms": {"per_leaf": round(t_leaf * 1e3, 2),
                          "flat_ravel": round(t_flat * 1e3, 2)},
        "n_leaves": len(jax.tree_util.tree_leaves(params)),
    }))

    # the number that matters: the full cached step (bench.py measures the
    # production per-leaf path; a flat variant needs a code toggle — only
    # worth adding if the standalone gap survives inside a fused program)
    ips, fpi, ms = bench_train_step(jax, jnp, cached=True)
    print(json.dumps({"cached_step_ms_per_leaf_production": round(ms, 1),
                      "images_per_sec": round(ips, 1)}))


if __name__ == "__main__":
    main()
