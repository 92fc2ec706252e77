"""Device-synthetic face datasets for at-scale benchmarking.

A drop-in :class:`FaceRecordDataset` stand-in whose images are *generated on
device* by a jitted kernel instead of decoded from disk: the host only moves
a ``(B,)`` int32 key vector per batch.  This makes it possible to drive the
FULL federated workload (``train.py`` with every mechanism on) at the
reference's true multiplicities — 40 clients x 100 IDs, the 420,671-image
public set, the 160k local-verification set (reference run.sh:3,
server.py:283-316) — on hosts whose storage/host->device path would
otherwise dominate, and to measure the accelerator-side timeline honestly.
The host data plane is measured separately (experiments/input_pipeline).

The image model mirrors the host recipe of experiments/convergence_tpu.py
(itself the miniature used for the convergence evidence in DESIGN.md): each
identity is a coarse 4x4-block color pattern, each sample adds pixel noise,
contrast/brightness jitter, and a spatial shift, so backbones genuinely
learn identity structure.  Public identities can be *blended* toward FL
identities so feature-space hard-negative mining (client.py:191-224) selects
realistic subset sizes.

Spec strings (``synth:key=value,...``) are understood by
``AllClientData``/CLIs wherever a dataset root is expected:

    synth:clients=40,ids_per_client=100,imgs_min=61,imgs_max=69,
          public_ids=6000,public_imgs=420671,veri_ids=4000,veri_imgs=40,
          blend=0.6,blend_frac=0.5,seed=100

Difficulty knobs (defaults reproduce the easy universe bit-for-bit):
``expr`` blends each SAMPLE toward a random distractor template with weight
U(0, expr) — structured intra-class variation a CNN cannot average away, so
pair cosines overlap and veri metrics come off the ceiling; ``shift_div``
sets the spatial-roll amplitude to size//shift_div (sphnet's fc head is
shift-sensitive, so larger shifts are a LEARNABLE nuisance — training
recovers what the pretrained model loses to it).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .recordio import SplitMeta

# distinct template-id namespaces so FL, public, and blend identities never
# collide (public ids sit far above any FL pool)
PUBLIC_GID_OFFSET = 1 << 20


def parse_synth_spec(spec: str) -> Dict[str, float]:
    """``synth:k=v,...`` -> dict with defaults at the reference's true scale
    (SURVEY.md §6: 40x100 IDs, 61-69 train imgs/ID, 420,671 public imgs /
    6000 IDs, 4000x40 veri)."""
    out: Dict[str, float] = dict(
        clients=40, ids_per_client=100, imgs_min=61, imgs_max=69,
        public_ids=6000, public_imgs=420671, public_imgs_min=61,
        public_imgs_max=79, veri_ids=4000, veri_imgs=40,
        blend=0.6, blend_frac=0.5, seed=100, image_size=112, noise=18,
        block=4, expr=0.0, shift_div=8)
    body = spec.split(":", 1)[1] if ":" in spec else ""
    for kv in body.split(","):
        if not kv.strip():
            continue
        k, v = kv.split("=")
        out[k.strip()] = float(v)
    for k in out:
        if k not in ("blend", "blend_frac", "expr"):
            out[k] = int(out[k])
    return out


def explicit_synth_keys(spec: str) -> set:
    """Keys the spec string names explicitly (vs defaulted).  CLIs use this
    to detect spec-vs-flag conflicts instead of silently overriding."""
    body = spec.split(":", 1)[1] if ":" in spec else ""
    return {kv.split("=")[0].strip() for kv in body.split(",") if kv.strip()}


def is_synth_spec(path: str) -> bool:
    return isinstance(path, str) and path.startswith("synth:")


def _make_generator(size: int, noise: int, block: int, expr: float,
                    shift_div: int):
    """Jitted (keys, gids, blend_gids, blend_w, dseeds, master) -> u8 images.

    All per-batch inputs are flat ``(B,)`` vectors so ONE executable serves
    every synthetic dataset of a given (batch, size) shape — label/template
    lookups happen on host (tiny), keeping client datasets of ragged sizes
    from each triggering a recompile.  ``master`` is the universe key:
    templates depend only on (master, gid) so the train, veri, and public
    splits of one universe agree on what each identity looks like, while
    the nuisance stream additionally folds in the per-dataset seed so no
    two splits reuse samples.
    """
    import jax
    import jax.numpy as jnp

    rep = size // block

    def one(key_id, gid, bgid, bw, dseed, master):
        def block_of(g):
            kb = jax.random.fold_in(master, g)
            blk = jax.random.randint(kb, (block, block, 3), 30, 226)
            return blk.astype(jnp.float32)

        ki = jax.random.fold_in(jax.random.fold_in(master, (1 << 30) + dseed),
                                key_id)
        base = (1.0 - bw) * block_of(gid) + bw * block_of(bgid)
        if expr > 0.0:
            # "expression" nuisance: blend each SAMPLE toward a random
            # distractor template — structured intra-class variation along
            # inter-class directions, so pair cosines genuinely overlap and
            # the veri metrics stay off the ceiling (unlike iid pixel noise,
            # a CNN cannot average this out)
            u = expr * jax.random.uniform(jax.random.fold_in(ki, 5))
            dgid = jax.random.randint(jax.random.fold_in(ki, 6), (),
                                      1 << 26, 1 << 30)
            base = (1.0 - u) * base + u * block_of(dgid)
        base = jnp.repeat(jnp.repeat(base, rep, 0), rep, 1)
        n = jax.random.randint(jax.random.fold_in(ki, 0),
                               (size, size, 3), -noise, noise + 1)
        img = base + n.astype(jnp.float32)
        scale = 0.75 + 0.5 * jax.random.uniform(jax.random.fold_in(ki, 1))
        offset = jax.random.randint(jax.random.fold_in(ki, 2), (), -20, 21)
        amp = size // shift_div
        dy = jax.random.randint(jax.random.fold_in(ki, 3), (), -amp, amp + 1)
        dx = jax.random.randint(jax.random.fold_in(ki, 4), (), -amp, amp + 1)
        img = img * scale + offset.astype(jnp.float32)
        img = jnp.roll(img, (dy, dx), axis=(0, 1))
        return jnp.clip(img, 0, 255).astype(jnp.uint8)

    @jax.jit
    def gen(keys, gids, bgids, bw, dseeds, master):
        return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, None))(
            keys, gids, bgids, bw, dseeds, master)

    return gen


_GEN_CACHE: Dict = {}


def _generator(size: int, noise: int, block: int, expr: float,
               shift_div: int):
    key = (size, noise, block, expr, shift_div)
    if key not in _GEN_CACHE:
        _GEN_CACHE[key] = _make_generator(size, noise, block, expr, shift_div)
    return _GEN_CACHE[key]


class SyntheticFaceDataset:
    """FaceRecordDataset-compatible view over device-generated images.

    ``labels``: (N,) class of record key k at ``labels[k-1]``.
    ``class_gids``: (num_classes,) global template identity per class.
    ``blend_gids``/``blend_w``: optional per-class template mixing (public
    identities blended toward FL identities for realistic mining).
    ``seed`` is the *universe* seed (shared by every split so identities
    look the same everywhere); ``dataset_seed`` separates each split's
    nuisance/sample stream.
    """

    is_device_synthetic = True

    def __init__(self, labels: np.ndarray, class_gids: np.ndarray, *,
                 id_base: int = 0, seed: int = 100, dataset_seed: int = 0,
                 image_size: int = 112, noise: int = 18, block: int = 4,
                 expr: float = 0.0, shift_div: int = 8,
                 blend_gids: Optional[np.ndarray] = None,
                 blend_w: Optional[np.ndarray] = None):
        labels = np.asarray(labels, np.int32)
        self._labels_full = labels
        self.class_gids = np.asarray(class_gids, np.int32)
        n_classes = len(self.class_gids)
        self.blend_gids = (np.asarray(blend_gids, np.int32)
                           if blend_gids is not None else self.class_gids)
        self.blend_w = (np.asarray(blend_w, np.float32) if blend_w is not None
                        else np.zeros(n_classes, np.float32))
        self.meta = SplitMeta(num_images=len(labels), num_classes=n_classes,
                              id_base=id_base)
        self.imgidx = np.arange(1, len(labels) + 1)
        self.image_size = image_size
        self.noise = noise
        self.block = block  # template grid resolution (identity-space size)
        self.expr = float(expr)  # per-sample distractor-blend max weight
        self.shift_div = int(shift_div)  # roll amplitude = size // shift_div
        self.seed = seed
        self.dataset_seed = dataset_seed
        self._master = None  # device key, built lazily

    # --------------------------------------------------- reader interface

    @property
    def num_classes(self) -> Optional[int]:
        return self.meta.num_classes

    @property
    def id_base(self) -> Optional[int]:
        return self.meta.id_base

    def __len__(self) -> int:
        return len(self.imgidx)

    def all_labels(self, full: bool = False) -> np.ndarray:
        if full:
            return self._labels_full
        return self._labels_full[self.imgidx - 1]

    def read_label(self, pos: int) -> int:
        return int(self._labels_full[self.imgidx[pos] - 1])

    def subset(self, imgidx: np.ndarray) -> "SyntheticFaceDataset":
        view = object.__new__(SyntheticFaceDataset)
        view.__dict__.update(self.__dict__)
        view.imgidx = np.asarray(imgidx)
        return view

    # ----------------------------------------------------- device batches

    def synth_vectors(self, positions: np.ndarray):
        """Per-element generator inputs for ``positions`` — (keys, gids,
        blend_gids, blend_w, dseeds, labels), all host vectors.  Used
        directly by ``device_batch`` and composed across splits by
        ``CombinedDataset`` so a mixed local+public batch is ONE generator
        dispatch of a fixed shape."""
        keys = self.imgidx[np.asarray(positions)].astype(np.int32)
        labels = self._labels_full[keys - 1]
        return (keys, self.class_gids[labels], self.blend_gids[labels],
                self.blend_w[labels],
                np.full(len(keys), self.dataset_seed, np.int32),
                labels.astype(np.int32))

    def device_batch(self, positions: np.ndarray):
        """(positions) -> (device u8 NHWC images, host int32 labels)."""
        vecs = self.synth_vectors(positions)
        return synth_device_batch(self, vecs[:5]), vecs[5]

    def read(self, pos: int):
        """Host decode of one item (rare paths); delegates to the device
        generator so host and device views are identical."""
        imgs, labels = self.device_batch(np.array([pos]))
        return np.asarray(imgs)[0], int(labels[0])


def synth_device_batch(dataset: "SyntheticFaceDataset", vecs):
    """Run the shared generator for prepared per-element vectors."""
    import jax
    import jax.numpy as jnp

    if dataset._master is None:
        dataset._master = jax.random.PRNGKey(dataset.seed)
    keys, gids, bgids, bw, dseeds = vecs
    gen = _generator(dataset.image_size, dataset.noise,
                     dataset.block, dataset.expr, dataset.shift_div)
    return gen(jnp.asarray(keys), jnp.asarray(gids), jnp.asarray(bgids),
               jnp.asarray(bw), jnp.asarray(dseeds), dataset._master)


# ------------------------------------------------------------ FL builders


def build_fl_synthetic(spec: Dict) -> Dict[str, object]:
    """Build the whole FedFR data universe from a spec dict.

    Returns {"clients": [SyntheticFaceDataset...], "public": ...,
    "veri": ...}.  Identity scheme: FL global ids 0..(C*I-1) are shared by
    the client shards (train nuisance stream) and the veri set (its own key
    space -> unseen samples of the same identities); public ids live at
    PUBLIC_GID_OFFSET+j, optionally blended toward a random FL identity so
    mining finds hard negatives (reference client.py:191-224 semantics).
    """
    # independent per-split rng streams: the public/veri splits depend only
    # on (seed, their own spec keys), so a pretrain.py universe and a
    # train.py universe with different client multiplicities still agree on
    # the public set (fc.pth row alignment depends on it)
    seed = int(spec["seed"])
    rng = np.random.default_rng([seed, 1])
    rng_pub = np.random.default_rng([seed, 2])
    n_clients, ipc = int(spec["clients"]), int(spec["ids_per_client"])
    size, noise = int(spec["image_size"]), int(spec["noise"])
    block = int(spec.get("block", 4))
    hard = dict(expr=float(spec.get("expr", 0.0)),
                shift_div=int(spec.get("shift_div", 8)))

    clients = []
    for c in range(n_clients):
        counts = rng.integers(int(spec["imgs_min"]), int(spec["imgs_max"]) + 1,
                              ipc)
        labels = np.repeat(np.arange(ipc, dtype=np.int32), counts)
        gids = (c * ipc + np.arange(ipc)).astype(np.int32)
        clients.append(SyntheticFaceDataset(
            labels, gids, id_base=c * ipc, seed=seed, dataset_seed=c + 1,
            image_size=size, noise=noise, block=block, **hard))

    # public: exact total image count with per-ID counts in the split's range
    n_pub, total = int(spec["public_ids"]), int(spec["public_imgs"])
    if total < n_pub:
        raise ValueError(
            f"synth spec: public_imgs={total} < public_ids={n_pub} — every "
            f"public identity needs at least one image")
    counts = rng_pub.integers(int(spec["public_imgs_min"]),
                              int(spec["public_imgs_max"]) + 1, n_pub)
    # adjust to the exact total while respecting counts >= 1
    delta = total - int(counts.sum())
    step = 1 if delta > 0 else -1
    i = 0
    while delta != 0:
        j = i % n_pub
        if step > 0 or counts[j] > 1:
            counts[j] += step
            delta -= step
        i += 1
    labels = np.repeat(np.arange(n_pub, dtype=np.int32), counts)
    gids = (PUBLIC_GID_OFFSET + np.arange(n_pub)).astype(np.int32)
    n_fl = n_clients * ipc
    blend_gids = rng_pub.integers(0, max(n_fl, 1), n_pub).astype(np.int32)
    blend_on = rng_pub.random(n_pub) < float(spec["blend_frac"])
    blend_w = np.where(blend_on,
                       rng_pub.uniform(0.0, float(spec["blend"]), n_pub),
                       0.0).astype(np.float32)
    public = SyntheticFaceDataset(labels, gids, id_base=0, seed=seed,
                                  dataset_seed=500_001, image_size=size,
                                  noise=noise, block=block, **hard,
                                  blend_gids=blend_gids, blend_w=blend_w)

    n_veri, vpi = int(spec["veri_ids"]), int(spec["veri_imgs"])
    vlabels = np.repeat(np.arange(n_veri, dtype=np.int32), vpi)
    vgids = np.arange(n_veri, dtype=np.int32)  # same identities as FL pool
    veri = SyntheticFaceDataset(vlabels, vgids, id_base=0, seed=seed,
                                dataset_seed=900_001, image_size=size,
                                noise=noise, block=block, **hard)
    return {"clients": clients, "public": public, "veri": veri}
