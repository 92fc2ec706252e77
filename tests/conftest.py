"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

Mirrors the reference's determinism stance (seed 100, reference
train.py:21-35) and enables multi-chip sharding tests without TPUs
(SURVEY.md §4).
"""

import os
import sys

# NOTE: sitecustomize may have imported jax already (TPU plugin autoload), so
# plain env vars are too late — jax.config.update below is the reliable path.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/fedfr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(100)
    yield


@pytest.fixture(scope="session")
def tiny_split(tmp_path_factory):
    """A synthetic 3-class/24-image split rec with id_base=200."""
    from fedfr_tpu.data import codec, write_split

    root = tmp_path_factory.mktemp("tiny_split")
    rng = np.random.default_rng(0)
    payloads, labels = [], []
    for i in range(24):
        img = rng.integers(0, 256, size=(112, 112, 3), dtype=np.uint8)
        payloads.append(codec.encode_raw(img))
        labels.append(i % 3)
    write_split(str(root / "train.idx"), str(root / "train.rec"),
                payloads, labels, num_classes=3, id_base=200)
    return str(root)
