"""Plumbing regression for bench.py's benched programs (CPU, dry trace).

bench.py executes on the real chip only (driver end-of-round); these tests
abstractly evaluate the newest benched program so a signature drift in the
underlying step constructors is caught in CI instead of at bench time.
"""

import sys


def test_lockstep_bench_traces_and_counts_flops():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench

    ips, fpi, ms = bench.bench_train_step_lockstep(jax, jnp, K=2, dry=True)
    # same math per image as the sequential joint step (~70 GFLOP/img,
    # DESIGN.md performance notes); vmapping over K must not change it
    assert abs(fpi / 1e9 - 70.0) < 3.0, fpi
    assert ips == 0.0 and ms == 0.0  # dry mode never dispatches
