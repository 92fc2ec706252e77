"""Learning sanity: the training engine must actually separate classes."""

import numpy as np
import jax
import jax.numpy as jnp

from fedfr_tpu.data import codec, write_split
from fedfr_tpu.data.datasets import FaceRecordDataset
from fedfr_tpu.federated.embed import embed_dataset, make_embed_fn
from fedfr_tpu.federated.trainer import init_client_state, make_plain_train_step
from fedfr_tpu.models import build_backbone


def _class_separation(feats, labels):
    """mean intra-class cosine minus mean inter-class cosine."""
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = f @ f.T
    same = labels[:, None] == labels[None, :]
    np.fill_diagonal(same, False)
    off = ~np.eye(len(f), dtype=bool)
    return sim[same].mean() - sim[off & ~same].mean()


def test_plain_training_learns_separation(tmp_path):
    rng = np.random.default_rng(0)
    n_cls, per, hw = 4, 12, 24
    payloads, labels = [], []
    for c in range(n_cls):
        base = rng.integers(0, 255, size=(hw, hw, 3))
        for _ in range(per):
            img = np.clip(base + rng.integers(-25, 25, (hw, hw, 3)), 0, 255)
            payloads.append(codec.encode_raw(img.astype(np.uint8)))
            labels.append(c)
    root = tmp_path / "ds"
    root.mkdir()
    write_split(str(root / "train.idx"), str(root / "train.rec"),
                payloads, labels, num_classes=n_cls, id_base=0)
    ds = FaceRecordDataset(str(root))

    backbone = build_backbone("toy", 16)
    key = jax.random.PRNGKey(0)
    bvars = backbone.init(key, jnp.zeros((1, hw, hw, 3)), train=False)
    fc = 0.01 * jax.random.normal(key, (n_cls, 16))
    state = init_client_state(jax.device_get(bvars), jnp.asarray(fc), None)
    step = make_plain_train_step(backbone)

    embed_fn = make_embed_fn(backbone)
    feats0, labs = embed_dataset(embed_fn, {"params": jax.device_get(state.backbone["params"]),
                                            "batch_stats": jax.device_get(state.backbone["batch_stats"])},
                                 ds, 16)
    sep0 = _class_separation(feats0, labs)

    from fedfr_tpu.data.datasets import BatchLoader

    loader = BatchLoader(ds, 16, shuffle=True, seed=1, drop_last=True)
    losses = []
    n_steps = 0
    for epoch in range(60):
        for imgs, lbl, valid in loader.epoch():
            state, loss = step(state, jnp.asarray(imgs), jnp.asarray(lbl),
                               jnp.asarray(valid), 0.05, key, n_steps)
            n_steps += 1
        losses.append(float(loss))

    final_vars = jax.device_get(state.backbone)
    feats1, _ = embed_dataset(embed_fn, final_vars, ds, 16)
    sep1 = _class_separation(feats1, labs)

    assert losses[-1] < losses[0] - 3.0, (losses[0], losses[-1])
    assert sep1 > sep0 + 0.1, (sep0, sep1)
