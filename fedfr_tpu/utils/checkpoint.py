"""Native checkpointing: flat-npz pytree snapshots + round-level resume.

The reference only saves torch state_dicts and cannot resume a federated run
mid-training (SURVEY.md §5).  Here:

* ``save_native``/``load_native`` — portable flat .npz of any pytree
  (backbone variables, FC matrices, BCE params).  Structure round-trips
  exactly, except tuples load back as lists;
* ``RoundCheckpointer`` — whole-run state (global model, every client's FC /
  BCE / last-model, round counter, RNG) so training resumes exactly at the
  next round boundary.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            # escape dict keys that could be mistaken for indices — a dict
            # with digit-string keys (e.g. client ids) used to round-trip
            # into a list
            ek = f"={k}" if (k[:1] in ("#", "=") or k.isdigit()) else k
            out.update(_flatten(tree[k], f"{prefix}{ek}/"))
    elif isinstance(tree, (list, tuple)):
        # '#'-prefixed indices keep list elements distinguishable from
        # dict keys
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def convert(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.startswith("#") and k[1:].isdigit() for k in keys):
            return [convert(node[k]) for k in sorted(keys, key=lambda k: int(k[1:]))]
        if keys and all(k.isdigit() for k in keys):
            # legacy checkpoints (pre-'#' format) stored list indices bare;
            # new saves escape digit dict keys, so this only fires on them
            return [convert(node[k]) for k in sorted(keys, key=int)]
        return {k[1:] if k.startswith("=") else k: convert(v)
                for k, v in node.items()}

    return convert(root)


def save_native(tree: Any, path: str) -> None:
    flat = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    final = path if path.endswith(".npz") else path + ".npz"
    # atomic: the long-run watchdog/deadman kills (experiments/fullscale_tpu
    # .py) can land mid-write during the epoch-end save window; a truncated
    # pretrain_state.npz would crash the --resume relaunch that the kill
    # exists to enable
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **flat)
    os.replace(tmp, final)


def load_native(path: str) -> Any:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def save_orbax(tree: Any, path: str) -> None:
    """Orbax-backed checkpoint (optional alternative to the npz format)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_orbax(path: str) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


class RoundCheckpointer:
    """Round-granular save/resume of a whole federated run.

    ``keep`` bounds disk use for long runs: after each save, only the newest
    ``keep`` round states are retained (0 = keep all).  One reference-scale
    round state is ~7.6 GB (40 x sphere64/E512 client states + global), so a
    20-round run without retention needs ~150 GB of checkpoint disk.

    ``async_write`` overlaps the npz serialization (zlib-compressing a
    reference-scale state is minutes of single-core work) with the next
    round: ``save`` still fetches device state synchronously — then hands
    the host copy to a writer thread.  At most one write is outstanding;
    writer errors surface on the next ``save``/``restore``/``wait``.  The
    meta.json is written after the npz completes, so a crash mid-write never
    leaves a round that ``restore`` would pick up.

    ``bg_fetch`` additionally moves the device->host fetch itself into the
    writer thread: ``save`` snapshots *references* to the device buffers
    (jax arrays are immutable — the next round replaces the server's
    attributes with new arrays, it never mutates the old buffers) and copies
    host-side leaves, then returns immediately.  The thread fetches leaves
    in tree-flatten order (dict keys sort lexicographically: the per-client
    states first, then the global state) and drops each device reference as
    soon as its host copy lands, so the pinned extra HBM decays over the
    fetch instead of holding a full second round-state.  On the dev rig this overlaps the ~19 min tunnel-bound
    fetch of a reference-scale state with the next round's compute (the
    fetch is off the training dispatch path — transfers ride the relay
    while the chip computes).  A kill mid-fetch leaves a truncated npz with
    no meta.json, which ``restore`` ignores and ``_prune`` sweeps — the same
    guarantee as a kill mid-write.
    """

    def __init__(self, directory: str, keep: int = 0,
                 async_write: bool = False, bg_fetch: bool = False):
        self.directory = directory
        self.keep = keep
        self.async_write = async_write or bg_fetch
        self.bg_fetch = bg_fetch
        self.last_extra: dict = {}
        self._writer = None
        self._write_err: Optional[BaseException] = None
        os.makedirs(directory, exist_ok=True)

    @staticmethod
    def _snapshot(tree):
        """Self-contained snapshot: device arrays by reference (immutable),
        anything host-side copied so later in-place edits can't alias in."""
        import jax

        def snap(leaf):
            if isinstance(leaf, jax.Array):
                return leaf
            return np.array(leaf)

        return jax.tree_util.tree_map(snap, tree)

    @staticmethod
    def _fetch_releasing(box: list) -> Any:
        """Fetch ``box[0]`` (a pytree snapshot) to host numpy, releasing each
        device reference as soon as its host copy lands.  ``box`` is a
        1-element list so the caller's reference can be dropped too.

        RESOURCE_EXHAUSTED on a leaf retries with backoff instead of
        aborting: in bg-fetch mode the fetch runs concurrently with the
        next round's compute, and the chunked get's device-slice
        allocations can transiently lose the HBM race at the round's peak
        (measured live 2026-08-20: 40 resident client states + the pinned
        snapshot + a training step's transients tipped a 15.75 GB chip).
        Pressure drops between steps and as fetched leaves release, so a
        paced retry converts an OOM abort into a slower fetch; a chip that
        stays exhausted ~10 min is a real failure and still raises."""
        import time as _time

        import jax

        from . import transfer

        leaves, treedef = jax.tree_util.tree_flatten(box.pop())
        out = []
        for i in range(len(leaves)):
            for attempt in range(40):
                try:
                    out.append(transfer.chunked_device_get(leaves[i]))
                    break
                except Exception as e:  # jax runtime errors share no base
                    if "RESOURCE_EXHAUSTED" not in str(e) or attempt >= 39:
                        raise
                    _time.sleep(15)
            leaves[i] = None
        return jax.tree_util.tree_unflatten(treedef, out)

    def save(self, server, extra: Optional[dict] = None) -> str:
        # join the previous write BEFORE fetching a new host copy: otherwise
        # two full states (~GBs at reference scale) are resident at once
        self.wait()
        state = self._snapshot({
            "federated": server.federated_vars,
            "pretrained_fc": server.pretrained_fc
            if server.pretrained_fc is not None else np.zeros(0),
            "clients": {
                f"c{c.cid}": {
                    "fc_local": c.fc_local,
                    **({"bce": c.bce_vars} if c.bce_vars else {}),
                    **({"last": c.last_backbone}
                       if c.last_backbone is not None else {}),
                }
                for c in server.clients
            },
        })
        path = os.path.join(self.directory, f"round_{server.global_round}")
        meta = {"global_round": server.global_round,
                "global_epoch": server.global_epoch,
                "local_epoch": server.local_epoch,
                "train_decay": server.train_decay,
                # the client-sampling RNG: without it a resumed run with
                # client_sampled_ratio < 1 repeats the fresh-run draws
                "rng_state": server.rng.bit_generator.state,
                "extra": extra or {}}
        if not self.bg_fetch:
            state = self._fetch_releasing([state])
        if self.async_write:
            import threading

            self._writer = threading.Thread(
                target=self._write, args=([state], path, meta),
                name=f"round-ckpt-write-{server.global_round}", daemon=True)
            state = None  # the writer box holds the only reference now
            self._writer.start()
        else:
            self._write([state], path, meta)
            self.wait()  # surface the error in the caller, not later
        return path + ".npz"

    def _write(self, box: list, path: str, meta: dict) -> None:
        try:
            if self.bg_fetch:
                box = [self._fetch_releasing(box)]
            save_native(box.pop(), path)
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f)
            self._prune()
        except BaseException as e:  # raised on the caller's next wait()
            self._write_err = e

    def wait(self) -> None:
        """Join the outstanding async write (must run before process exit)
        and re-raise any error it hit."""
        if self._writer is not None:
            self._writer.join()
            self._writer = None
        if self._write_err is not None:
            err, self._write_err = self._write_err, None
            raise err

    def _rounds(self) -> list:
        rounds = []
        for name in os.listdir(self.directory):
            if name.startswith("round_") and name.endswith(".meta.json"):
                rounds.append(int(name[len("round_"):-len(".meta.json")]))
        return sorted(rounds)

    def _prune(self) -> None:
        if self.keep <= 0:
            return
        complete = self._rounds()
        for r in complete[:-self.keep]:
            base = os.path.join(self.directory, f"round_{r}")
            for suffix in (".npz", ".meta.json"):
                try:
                    os.remove(base + suffix)
                except OSError:
                    pass
        # a crash mid-async-write leaves a truncated round_K.npz with no
        # meta.json; restore() never picks it up, but without this sweep it
        # would survive every prune pass and defeat the disk bound
        for name in os.listdir(self.directory):
            if not (name.startswith("round_") and name.endswith(".npz")):
                continue
            stem = name[len("round_"):-len(".npz")]
            if stem.lstrip("-").isdigit() and int(stem) not in complete:
                try:
                    os.remove(os.path.join(self.directory, name))
                except OSError:
                    pass

    def latest(self) -> Optional[int]:
        rounds = self._rounds()
        return rounds[-1] if rounds else None

    def restore(self, server, round_idx: Optional[int] = None) -> int:
        self.wait()
        if round_idx is None:
            round_idx = self.latest()
        if round_idx is None:
            return 0
        path = os.path.join(self.directory, f"round_{round_idx}")
        state = load_native(path)
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        server.federated_vars = state["federated"]
        if state["pretrained_fc"].size:
            server.pretrained_fc = state["pretrained_fc"]
        for c in server.clients:
            cs = state["clients"][f"c{c.cid}"]
            c.fc_local = cs["fc_local"]
            if "bce" in cs:
                c.bce_vars = cs["bce"]
            if "last" in cs:
                c.last_backbone = cs["last"]
        server.global_round = meta["global_round"]
        server.global_epoch = meta["global_epoch"]
        server.local_epoch = meta["local_epoch"]
        server.train_decay = meta["train_decay"]
        if "rng_state" in meta:
            server.rng.bit_generator.state = meta["rng_state"]
        # caller-owned state saved via ``extra`` (e.g. the verification
        # callback's best-accuracy table, train.py)
        self.last_extra = meta.get("extra", {})
        return round_idx
