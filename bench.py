"""Benchmark: flagship-model throughput on one TPU chip, vs speed-of-light.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Two workloads, both on sphere64 (the FedFR flagship backbone, reference
run.sh:2), bf16 trunk:

* embedding forward at batch 2048 — the kernel behind training forwards,
  per-round public-set mining (420k imgs/round, reference server.py:242-263)
  and every evaluation pipeline;
* the joint-objective train step at the production shape (combined batch
  256, 100 local + 6000 global FC rows, BCE transformation branch, MOON
  contrastive with two frozen forwards, momentum-SGD) — the hot loop of
  client training (reference client.py:355-404).

The reference repo publishes no numbers (BASELINE.md), so ``vs_baseline`` is
NOT a cross-rig guess: it is achieved model FLOPs / chip peak FLOPs (MFU)
against a first-principles speed-of-light denominator — model FLOPs counted
by walking the traced jaxpr (utils/flops.py; scan-trip-count aware, unlike
XLA's executable cost_analysis), peak from the chip's bf16 spec.  1.0 would
mean running at the hardware roofline.
"""

import json
import os
import time

import numpy as np

# dense bf16 peak FLOP/s per chip by device kind (public TPU specs)
PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,   # Trillium
    "TPU v6e": 918e12,
}
DEFAULT_PEAK = 197e12


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return DEFAULT_PEAK


def _flops_per_call(fn, *example_args) -> float:
    """Model FLOPs by jaxpr walk (utils/flops.py).

    NOT the executable's cost_analysis(): XLA counts a lax.scan body once
    instead of times its trip count, under-reporting scan-rolled models ~6x
    (measured: 2.06 vs 12.7 GFLOP/img for sphere64) and overstating
    headroom by the same factor.
    """
    from fedfr_tpu.utils.flops import count_flops

    try:
        return count_flops(fn, *example_args)
    except Exception:
        return float("nan")


def bench_embed(jax, jnp, backbone, variables, normalize_images,
                batch: int = 2048, iters: int = 6):
    def embed(variables, u8):
        return backbone.apply(variables, normalize_images(u8), train=False)

    example = jax.ShapeDtypeStruct((batch, 112, 112, 3), jnp.uint8)
    compiled = jax.jit(embed).lower(variables, example).compile()
    flops = _flops_per_call(embed, variables, example)

    # distinct inputs per iteration (identical dispatches can be served from
    # an execution cache on some PJRT transports), generated on device so the
    # ~1 MB/s host->device relay is excluded from timing
    @jax.jit
    def make_batch(key):
        return jax.random.randint(key, (batch, 112, 112, 3), 0, 255, jnp.uint8)

    batches = [make_batch(k)
               for k in jax.random.split(jax.random.PRNGKey(0), iters)]
    for b in batches:
        b.block_until_ready()

    # warmup (np.asarray = device_get, the only reliable completion barrier
    # on the tunneled PJRT transport)
    np.asarray(compiled(variables, batches[0])[:1])
    np.asarray(compiled(variables, batches[1])[:1])

    t0 = time.perf_counter()
    outs = [compiled(variables, b) for b in batches]
    # single completion barrier: the device executes dispatches in order, so
    # fetching one row of the LAST output awaits them all — per-iteration
    # fetches would add one tunnel round-trip each and deflate throughput
    got = np.asarray(outs[-1][:1])
    dt = time.perf_counter() - t0
    assert np.isfinite(got).all()
    ips = batch * iters / dt
    return ips, flops / batch


def cheap_init(jax, jnp, shapes_tree):
    """Variance-preserving random weights from eval_shape'd shapes, built in
    ONE jitted program (no flax init to remote-compile).

    Weight VALUES are irrelevant for throughput, but all-zero weights NaN
    the backward pass (d||x||/dx at 0) and constant weights explode through
    the BN-free sphnet trunk; conv/linear kernels get fan-in scaling,
    biases / PReLU slopes / BN stats a safe positive constant.
    """
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


def bench_train_step(jax, jnp, iters: int = 4, cached: bool = False):
    """Joint-objective step at production shape (client.py:355-404).

    ``cached`` benches the cached-contrastive variant (--cache_contrastive):
    the two frozen MOON forwards replaced by gathers into per-round
    (N, 2, E) feature caches at a realistic combined-dataset size.  The
    once-per-(client, round) cache build runs at the embedding rate benched
    above; its amortization is composed in DESIGN.md."""
    import functools

    from fedfr_tpu.federated.trainer import (
        init_client_state,
        make_branch_train_step,
    )
    from fedfr_tpu.models import BCEModule, build_backbone
    from fedfr_tpu.models.factory import fast_zero_variables

    E, B = 512, 256
    n_local, n_global = 100, 6000
    backbone = build_backbone("sphnet", E, bf16=True, scan_blocks=True)
    key = jax.random.PRNGKey(0)

    init = functools.partial(cheap_init, jax, jnp)

    bvars = init(jax.eval_shape(
        lambda: backbone.init(key, jnp.zeros((1, 112, 112, 3)), train=False)))
    bce = BCEModule(E, n_local)
    bce_vars = init(jax.eval_shape(
        bce.init, key, jnp.zeros((1, E)), jnp.zeros((1,), jnp.int32)))
    fc = jnp.full((n_local + n_global, E), 1e-2, jnp.float32)
    # the trained state is donated each step; it must NOT alias the buffers
    # passed as the (non-donated) global/last contrastive models
    state = init_client_state(
        jax.tree_util.tree_map(jnp.copy, bvars), fc, bce_vars)

    step = make_branch_train_step(backbone, bce, num_local=n_local,
                                  num_clients=40, jit=False,
                                  cached_contrastive=cached)
    shp = lambda a: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), a)
    img_s = jax.ShapeDtypeStruct((B, 112, 112, 3), jnp.uint8)
    lbl_s = jax.ShapeDtypeStruct((B,), jnp.int32)
    val_s = jax.ShapeDtypeStruct((B,), bool)
    lr_s = jax.ShapeDtypeStruct((), jnp.float32)
    key_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
    step_s = jax.ShapeDtypeStruct((), jnp.int32)
    if cached:
        N_CACHE = 49_152  # reference-scale combined dataset, bucket-padded (8192s)
        g_cache = jnp.full((N_CACHE, 2, E), 1e-2, jnp.float32)
        l_cache = jnp.full((N_CACHE, 2, E), 2e-2, jnp.float32)
        idx_s = jax.ShapeDtypeStruct((B,), jnp.int32)
        frozen_args_s = (shp(g_cache), shp(l_cache))
        trailing_s = (idx_s, lr_s, key_s, step_s)
    else:
        frozen_args_s = (shp(bvars), shp(bvars))
        trailing_s = (lr_s, key_s, step_s)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        shp(state), *frozen_args_s, img_s, lbl_s, val_s,
        *trailing_s).compile()
    flops = _flops_per_call(step, shp(state), *frozen_args_s, img_s,
                            lbl_s, val_s, *trailing_s)

    @jax.jit
    def make_inputs(key):
        imgs = jax.random.randint(key, (B, 112, 112, 3), 0, 255, jnp.uint8)
        labels = jax.random.randint(key, (B,), 0, n_local + n_global, jnp.int32)
        idx = jax.random.randint(key, (B,), 0, 49_152, jnp.int32)
        return imgs, labels, idx

    n_total = iters + 2
    inputs = [make_inputs(k)
              for k in jax.random.split(jax.random.PRNGKey(1), n_total)]
    valid = jnp.ones((B,), bool)
    lr = jnp.float32(0.001)
    rng = jnp.asarray(jax.random.PRNGKey(2))
    for i, l, _x in inputs:
        i.block_until_ready()

    def dispatch(state, n):
        imgs, labels, idx = inputs[n]
        if cached:
            return compiled(state, g_cache, l_cache, imgs, labels, valid,
                            idx, lr, rng, jnp.int32(n))
        return compiled(state, bvars, bvars, imgs, labels, valid,
                        lr, rng, jnp.int32(n))

    metrics = None
    for w in range(2):  # warmup (donated state flows through)
        state, metrics = dispatch(state, w)
    np.asarray(metrics.loss)

    t0 = time.perf_counter()
    for s in range(iters):
        state, metrics = dispatch(state, 2 + s)
    loss = np.asarray(metrics.loss)  # completion barrier (chained states)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss).all()
    ips = B * iters / dt
    return ips, flops / B, dt / iters * 1e3


def bench_train_step_lockstep(jax, jnp, K: int = 2, iters: int = 4,
                              dry: bool = False):
    """The client-parallel joint step at lockstep K on ONE chip (--lockstep,
    parallel/client_parallel.py): K clients advance together in one vmapped
    dispatch, so the convs see an effective batch of K*256.  This is the
    production path for at-scale rounds and the batch-efficiency answer to
    the sequential step's MFU plateau: the per-dispatch batch doubles while
    the math per client stays the reference's com_batch_size 256
    (client.py:355-404)."""
    import functools

    from fedfr_tpu.federated.trainer import init_client_state
    from fedfr_tpu.models import BCEModule, build_backbone
    from fedfr_tpu.models.factory import fast_zero_variables
    from fedfr_tpu.parallel.client_parallel import make_parallel_branch_step
    from fedfr_tpu.parallel.fedavg import stack_trees

    E, B = 512, 256
    n_local, n_global = 100, 6000
    backbone = build_backbone("sphnet", E, bf16=True, scan_blocks=True)
    key = jax.random.PRNGKey(0)
    init = functools.partial(cheap_init, jax, jnp)
    bvars = init(jax.eval_shape(
        lambda: backbone.init(key, jnp.zeros((1, 112, 112, 3)), train=False)))
    bce = BCEModule(E, n_local)
    bce_vars = init(jax.eval_shape(
        bce.init, key, jnp.zeros((1, E)), jnp.zeros((1,), jnp.int32)))
    fc = jnp.full((n_local + n_global, E), 1e-2, jnp.float32)
    state = stack_trees([init_client_state(
        jax.tree_util.tree_map(jnp.copy, bvars), fc, bce_vars)
        for _ in range(K)])
    last = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (K,) + x.shape), bvars)

    step = make_parallel_branch_step(backbone, bce, num_local=n_local,
                                     num_clients=40)

    @jax.jit
    def make_inputs(key):
        imgs = jax.random.randint(key, (K, B, 112, 112, 3), 0, 255, jnp.uint8)
        labels = jax.random.randint(key, (K, B), 0, n_local + n_global,
                                    jnp.int32)
        return imgs, labels

    n_total = iters + 2
    inputs = [make_inputs(k)
              for k in jax.random.split(jax.random.PRNGKey(1), n_total)]
    valid = jnp.ones((K, B), bool)
    lr = jnp.float32(0.001)
    rngs = jnp.stack([jnp.asarray(jax.random.PRNGKey(2 + c))
                      for c in range(K)])
    for i, l in inputs:
        i.block_until_ready()

    flops = _flops_per_call(step, state, bvars, last, *inputs[0], valid,
                            lr, rngs, jnp.int32(0))
    if dry:
        # plumbing check without executing (sphere64 at 2x256 is minutes per
        # dispatch on CPU): abstract-evaluate the full jitted program
        out_state, out_metrics = jax.eval_shape(
            step, state, bvars, last, *inputs[0], valid, lr, rngs,
            jnp.int32(0))
        assert out_metrics.loss.shape == (K,)
        chex = jax.tree_util.tree_structure
        assert chex(out_state) == chex(state)
        return 0.0, flops / (K * B), 0.0

    metrics = None
    for w in range(2):  # warmup (donated state flows through)
        state, metrics = step(state, bvars, last, *inputs[w], valid, lr,
                              rngs, jnp.int32(w))
    np.asarray(metrics.loss)

    t0 = time.perf_counter()
    for s in range(iters):
        state, metrics = step(state, bvars, last, *inputs[2 + s], valid, lr,
                              rngs, jnp.int32(2 + s))
    loss = np.asarray(metrics.loss)  # completion barrier (chained states)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss).all()
    ips = K * B * iters / dt
    return ips, flops / (K * B), dt / iters * 1e3


def bench_pretrain_step(jax, jnp, sample_rate: float, iters: int = 4):
    """Class-sharded margin-softmax pretraining step at production shape
    (sphere64, batch 512, 6000 classes — the SURVEY north-star kernel,
    reference partial_fc.py:130-176) through the same step construction as
    pretrain.py.  ``sample_rate < 1`` benches the negative-sampled variant
    (partial_fc.py:89-106)."""
    import functools

    from fedfr_tpu.federated.state import train_preprocess
    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.parallel.mesh import model_mesh
    from fedfr_tpu.parallel.partial_fc import (
        pad_classes,
        partial_fc_loss,
        sampled_partial_fc_loss,
    )
    from fedfr_tpu.utils.optim import sgd_init, sgd_update

    E, B, C = 512, 512, 6000
    backbone = build_backbone("sphnet", E, bf16=True, scan_blocks=True)
    key = jax.random.PRNGKey(0)
    init = functools.partial(cheap_init, jax, jnp)
    bvars = init(jax.eval_shape(
        lambda: backbone.init(key, jnp.zeros((1, 112, 112, 3)), train=False)))
    mesh = model_mesh()
    n_shards = mesh.shape["model"]
    weight = jnp.full((C, E), 1e-2, jnp.float32)
    weight, num_valid = pad_classes(weight, n_shards)
    sampled = sample_rate < 1.0
    if sampled:
        num_sample = max(1, int(sample_rate * weight.shape[0] // n_shards))
        pfc = sampled_partial_fc_loss(mesh, num_sample, "CosFace", 64.0, 0.4,
                                      num_valid=num_valid)
    else:
        pfc = partial_fc_loss(mesh, "CosFace", 64.0, 0.4, num_valid=num_valid)

    def loss_fn(params, weight, x, labels, rng):
        feats = backbone.apply({"params": params}, x, train=True)
        if sampled:
            return pfc(rng, feats, labels, weight)
        return pfc(feats, labels, weight)

    def train_step(params, weight, opt, wopt, u8, labels, rng):
        prng, srng = jax.random.split(rng)
        x = train_preprocess(prng, u8)
        loss, (gp, gw) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, weight, x, labels, srng)
        params, opt = sgd_update(params, gp, opt, 0.05, 0.9, 5e-4)
        weight, wopt = sgd_update(weight, gw, wopt, 0.05, 0.9, 5e-4)
        return params, weight, opt, wopt, loss

    params = bvars["params"]
    opt, wopt = sgd_init(params), sgd_init(weight)
    jit_step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))
    shp = lambda a: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), a)
    img_s = jax.ShapeDtypeStruct((B, 112, 112, 3), jnp.uint8)
    lbl_s = jax.ShapeDtypeStruct((B,), jnp.int32)
    key_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
    compiled = jit_step.lower(shp(params), shp(weight), shp(opt), shp(wopt),
                              img_s, lbl_s, key_s).compile()
    flops = _flops_per_call(train_step, shp(params), shp(weight), shp(opt),
                            shp(wopt), img_s, lbl_s, key_s)

    @jax.jit
    def make_inputs(key):
        imgs = jax.random.randint(key, (B, 112, 112, 3), 0, 255, jnp.uint8)
        labels = jax.random.randint(key, (B,), 0, C, jnp.int32)
        return imgs, labels

    n_total = iters + 2
    inputs = [make_inputs(k)
              for k in jax.random.split(jax.random.PRNGKey(1), n_total)]
    for i, l in inputs:
        i.block_until_ready()
    rngs = jax.random.split(jax.random.PRNGKey(2), n_total)

    loss = None
    for w in range(2):  # warmup (donated buffers flow through)
        imgs, labels = inputs[w]
        params, weight, opt, wopt, loss = compiled(params, weight, opt, wopt,
                                                   imgs, labels, rngs[w])
    np.asarray(loss)
    t0 = time.perf_counter()
    for s in range(iters):
        imgs, labels = inputs[2 + s]
        params, weight, opt, wopt, loss = compiled(params, weight, opt, wopt,
                                                   imgs, labels, rngs[2 + s])
    got = np.asarray(loss)  # chained states -> single completion barrier
    dt = time.perf_counter() - t0
    assert np.isfinite(got).all()
    return B * iters / dt, flops / B, dt / iters * 1e3


def bench_roc(jax, jnp, n: int = 163840, targets: int = 4096, e: int = 512,
              iters: int = 3):
    """Personalized all-pairs ROC histogram at the production workload
    (reference roc_cuda.py:14-28: 160k local-veri imgs x 4k target rows,
    512-d) through the production dispatch path (Pallas on TPU)."""
    from fedfr_tpu.ops.roc_histogram import pairwise_roc_histogram

    # feats generated + normalized on device (tunnel-safe), distinct per iter
    @jax.jit
    def make(key):
        f = jax.random.normal(key, (n, e), jnp.float32)
        f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
        l = jax.random.randint(key, (n,), 0, targets, jnp.int32)
        return f, l

    # iters+1 distinct sets: warmup uses its own (identical repeated
    # dispatches can be served from an execution cache on some transports)
    keys = jax.random.split(jax.random.PRNGKey(3), iters + 1)
    sets = [make(k) for k in keys]
    for f, l in sets:
        f.block_until_ready()

    pairs = targets * n - targets * (targets + 1) // 2
    _ = pairwise_roc_histogram(*sets[0], targets)  # compile + warmup
    sets = sets[1:]
    t0 = time.perf_counter()
    for f, l in sets:
        hist = pairwise_roc_histogram(f, l, targets)  # np.asarray barrier inside
    dt = (time.perf_counter() - t0) / iters
    assert int(hist.sum()) == pairs, (int(hist.sum()), pairs)
    return dt, pairs / dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fedfr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.models.factory import fast_zero_variables
    from fedfr_tpu.federated.state import normalize_images

    peak = _peak_flops(jax.devices()[0])
    kind = getattr(jax.devices()[0], "device_kind", "unknown")

    backbone = build_backbone("sphnet", 512, bf16=True, scan_blocks=True)
    # weight values are irrelevant for throughput; zero-init avoids remote-
    # compiling the full flax init program (~70s on the tunneled rig)
    variables = fast_zero_variables(backbone, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 112, 112, 3)), train=False)

    embed_ips, embed_fpi = bench_embed(jax, jnp, backbone, variables,
                                       normalize_images)
    embed_mfu = embed_ips * embed_fpi / peak

    train_ips, train_fpi, ms_per_step = bench_train_step(jax, jnp)
    train_mfu = train_ips * train_fpi / peak

    ctrain_ips, ctrain_fpi, ctrain_ms = bench_train_step(jax, jnp, cached=True)
    ctrain_mfu = ctrain_ips * ctrain_fpi / peak

    # degradable: a failure in the newest benched program must not take the
    # whole bench line down with it (main() retries would re-fail here)
    try:
        ls_ips, ls_fpi, ls_ms = bench_train_step_lockstep(jax, jnp, K=2)
        ls_mfu = ls_ips * ls_fpi / peak
    except Exception:
        import traceback

        traceback.print_exc()
        ls_ips = ls_fpi = ls_ms = ls_mfu = float("nan")

    pre_ips, pre_fpi, pre_ms = bench_pretrain_step(jax, jnp, 1.0)
    pre_mfu = pre_ips * pre_fpi / peak
    spre_ips, spre_fpi, spre_ms = bench_pretrain_step(jax, jnp, 0.1)
    spre_mfu = spre_ips * spre_fpi / peak

    roc_s, roc_pps = bench_roc(jax, jnp)

    print(json.dumps({
        "metric": "sphere64_embed_images_per_sec_per_chip",
        "value": round(embed_ips, 1),
        "unit": "images/sec",
        # honest denominator: fraction of the chip's bf16 speed-of-light at
        # the XLA-measured model FLOP cost (NOT a cross-rig guess — the
        # reference publishes no numbers, see BASELINE.md)
        "vs_baseline": round(embed_mfu, 3),
        "baseline": "model-FLOPs speed-of-light (MFU); 1.0 = bf16 roofline",
        "device_kind": kind,
        "peak_bf16_flops": peak,
        "embed": {
            "images_per_sec": round(embed_ips, 1),
            "gflop_per_img": round(embed_fpi / 1e9, 2),
            "mfu": round(embed_mfu, 3),
        },
        "train_step": {
            "images_per_sec": round(train_ips, 1),
            "ms_per_step_batch256": round(ms_per_step, 1),
            "gflop_per_img": round(train_fpi / 1e9, 2),
            "mfu": round(train_mfu, 3),
            # --cache_contrastive: frozen MOON forwards -> per-round cache
            # gathers (same math; cache built once per client run at the
            # embed rate above)
            "cached_contrastive": {
                "images_per_sec": round(ctrain_ips, 1),
                "ms_per_step_batch256": round(ctrain_ms, 1),
                "gflop_per_img": round(ctrain_fpi / 1e9, 2),
                "mfu": round(ctrain_mfu, 3),
            },
            # --lockstep 2: the client-parallel production path on one chip
            # (two clients per vmapped dispatch, effective conv batch 512)
            "lockstep2": {
                "images_per_sec": round(ls_ips, 1),
                "ms_per_step_2x256": round(ls_ms, 1),
                "gflop_per_img": round(ls_fpi / 1e9, 2),
                "mfu": round(ls_mfu, 3),
            },
        },
        "pretrain_step": {
            "images_per_sec": round(pre_ips, 1),
            "ms_per_step_batch512": round(pre_ms, 1),
            "gflop_per_img": round(pre_fpi / 1e9, 2),
            "mfu": round(pre_mfu, 3),
            "sampled_0.1": {
                "images_per_sec": round(spre_ips, 1),
                "ms_per_step_batch512": round(spre_ms, 1),
                "gflop_per_img": round(spre_fpi / 1e9, 2),
                "mfu": round(spre_mfu, 3),
            },
            "workload": "sphere64 b512, 6000-class sharded margin softmax "
                        "(partial_fc.py:130-176)",
        },
        "roc_histogram": {
            "s_per_client": round(roc_s, 3),
            "gpairs_per_sec": round(roc_pps / 1e9, 2),
            "workload": "160k x 4k x 512-d all-pairs (roc_cuda.py scale)",
        },
    }))


if __name__ == "__main__":
    # transient tunnel/compile hiccups (backend UNAVAILABLE, dropped
    # connections) are a measured failure mode on tunneled rigs: retry on a
    # spacing that lets a short outage pass rather than immediately re-dying
    import traceback

    attempts = int(os.environ.get("FEDFR_BENCH_RETRIES", "5"))
    for attempt in range(attempts):
        try:
            main()
            break
        except Exception:
            traceback.print_exc()
            if attempt == attempts - 1:
                raise
            time.sleep(min(90 * (attempt + 1), 300))
