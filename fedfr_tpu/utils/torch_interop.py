"""torch ``.pth`` <-> flax pytree checkpoint interop.

The reference ecosystem exchanges weights as torch state_dicts
(``pretrain/backbone.pth``, per-round ``backbone_%d.pth``, per-client
``clients/client_%d/{backbone,bce_module}.pth``).  These converters keep the
rebuild drop-in compatible: it can consume reference checkpoints and emit
checkpoints the reference evaluation scripts could load.

Layout conversions:
* conv kernels: torch OIHW -> flax HWIO
* dense kernels: torch (out, in) -> flax (in, out)
* the flatten boundary before the embedding fc: torch flattens NCHW
  (c*49 + h*7 + w) while the NHWC rebuild flattens (h*7*512 + w*512 + c),
  so the fc kernel's input axis is permuted accordingly.
* BatchNorm: weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor -> float32 numpy."""
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _conv(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _conv_back(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(k.transpose(3, 2, 0, 1))  # HWIO -> OIHW


def _dense(t) -> np.ndarray:
    return _np(t).T


def _dense_flat(t, channels: int, hw: int = 7) -> np.ndarray:
    """fc over flattened feature map: permute CHW input order to HWC."""
    w = _np(t)  # (out, C*H*W)
    out = w.shape[0]
    return np.ascontiguousarray(
        w.reshape(out, channels, hw, hw).transpose(2, 3, 1, 0).reshape(hw * hw * channels, out))


def _dense_flat_back(k: np.ndarray, channels: int, hw: int = 7) -> np.ndarray:
    out = k.shape[1]
    return np.ascontiguousarray(
        k.reshape(hw, hw, channels, out).transpose(3, 2, 0, 1).reshape(out, hw * hw * channels))


def _bn_from(sd, key) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {"mean": _np(sd[f"{key}.running_mean"]), "var": _np(sd[f"{key}.running_var"])}
    return params, stats


# ---------------------------------------------------------------- sphnet

_SPH_LAYERS = {20: (1, 2, 4, 1), 64: (3, 7, 16, 3)}


def sphnet_from_torch(sd: Dict[str, Any], depth: int = 64) -> Dict[str, Any]:
    """torch sphere state_dict -> flax variables {'params': ...}."""
    params: Dict[str, Any] = {}
    for stage, blocks in enumerate(_SPH_LAYERS[depth], start=1):
        params[f"layer{stage}_conv"] = {
            "kernel": _conv(sd[f"layer{stage}.0.weight"]),
            "bias": _np(sd[f"layer{stage}.0.bias"]),
        }
        params[f"layer{stage}_prelu"] = {"alpha": _np(sd[f"layer{stage}.1.weight"])}
        for b in range(blocks):
            tb = f"layer{stage}.{2 + b}"
            params[f"layer{stage}_block{b}"] = {
                "conv1": {"kernel": _conv(sd[f"{tb}.conv1.weight"])},
                "prelu1": {"alpha": _np(sd[f"{tb}.prelu1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{tb}.conv2.weight"])},
                "prelu2": {"alpha": _np(sd[f"{tb}.prelu2.weight"])},
            }
    params["fc"] = {"kernel": _dense_flat(sd["fc.weight"], 512),
                    "bias": _np(sd["fc.bias"])}
    return {"params": params}


def sphnet_to_torch(variables: Dict[str, Any], depth: int = 64) -> Dict[str, Any]:
    import torch

    p = variables["params"]
    sd: Dict[str, Any] = {}

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x, dtype=np.float32)))

    for stage, blocks in enumerate(_SPH_LAYERS[depth], start=1):
        sd[f"layer{stage}.0.weight"] = t(_conv_back(np.asarray(p[f"layer{stage}_conv"]["kernel"])))
        sd[f"layer{stage}.0.bias"] = t(p[f"layer{stage}_conv"]["bias"])
        sd[f"layer{stage}.1.weight"] = t(p[f"layer{stage}_prelu"]["alpha"])
        for b in range(blocks):
            fb = p[f"layer{stage}_block{b}"]
            tb = f"layer{stage}.{2 + b}"
            sd[f"{tb}.conv1.weight"] = t(_conv_back(np.asarray(fb["conv1"]["kernel"])))
            sd[f"{tb}.prelu1.weight"] = t(fb["prelu1"]["alpha"])
            sd[f"{tb}.conv2.weight"] = t(_conv_back(np.asarray(fb["conv2"]["kernel"])))
            sd[f"{tb}.prelu2.weight"] = t(fb["prelu2"]["alpha"])
    sd["fc.weight"] = t(_dense_flat_back(np.asarray(p["fc"]["kernel"]), 512))
    sd["fc.bias"] = t(p["fc"]["bias"])
    return sd


def sphnet_scan_params(params: Dict[str, Any], depth: int = 64) -> Dict[str, Any]:
    """Unrolled sphnet params -> scan_blocks layout (blocks stacked axis 0)."""
    out: Dict[str, Any] = {}
    for stage, blocks in enumerate(_SPH_LAYERS[depth], start=1):
        out[f"layer{stage}_conv"] = params[f"layer{stage}_conv"]
        out[f"layer{stage}_prelu"] = params[f"layer{stage}_prelu"]
        stacked: Dict[str, Any] = {}
        for sub in ("conv1", "prelu1", "conv2", "prelu2"):
            leaves = [params[f"layer{stage}_block{b}"][sub] for b in range(blocks)]
            stacked[sub] = {k: np.stack([np.asarray(l[k]) for l in leaves])
                            for k in leaves[0]}
        out[f"layer{stage}_blocks"] = {"block": stacked}
    out["fc"] = params["fc"]
    return out


def sphnet_unscan_params(params: Dict[str, Any], depth: int = 64) -> Dict[str, Any]:
    """scan_blocks layout -> unrolled sphnet params."""
    out: Dict[str, Any] = {}
    for stage, blocks in enumerate(_SPH_LAYERS[depth], start=1):
        out[f"layer{stage}_conv"] = params[f"layer{stage}_conv"]
        out[f"layer{stage}_prelu"] = params[f"layer{stage}_prelu"]
        stacked = params[f"layer{stage}_blocks"]["block"]
        for b in range(blocks):
            out[f"layer{stage}_block{b}"] = {
                sub: {k: np.asarray(v)[b] for k, v in stacked[sub].items()}
                for sub in ("conv1", "prelu1", "conv2", "prelu2")}
    out["fc"] = params["fc"]
    return out


# ---------------------------------------------------------------- iresnet

_IRES_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 14, 3),
                100: (3, 13, 30, 3), 200: (6, 26, 60, 6)}


def iresnet_from_torch(sd: Dict[str, Any], depth: int) -> Dict[str, Any]:
    """torch IResNet state_dict -> flax variables {'params', 'batch_stats'}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn_from(sd, "bn1")
    params["prelu"] = {"alpha": _np(sd["prelu.weight"])}

    inplanes = 64
    for stage, (blocks, feats) in enumerate(zip(_IRES_LAYERS[depth], (64, 128, 256, 512)), start=1):
        for b in range(blocks):
            tb = f"layer{stage}.{b}"
            name = f"layer{stage}_block{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            bp["bn1"], bs["bn1"] = _bn_from(sd, f"{tb}.bn1")
            bp["conv1"] = {"kernel": _conv(sd[f"{tb}.conv1.weight"])}
            bp["bn2"], bs["bn2"] = _bn_from(sd, f"{tb}.bn2")
            bp["prelu"] = {"alpha": _np(sd[f"{tb}.prelu.weight"])}
            bp["conv2"] = {"kernel": _conv(sd[f"{tb}.conv2.weight"])}
            bp["bn3"], bs["bn3"] = _bn_from(sd, f"{tb}.bn3")
            stride = 2 if b == 0 else 1
            if stride != 1 or inplanes != feats:
                bp["ds_conv"] = {"kernel": _conv(sd[f"{tb}.downsample.0.weight"])}
                bp["ds_bn"], bs["ds_bn"] = _bn_from(sd, f"{tb}.downsample.1")
            inplanes = feats
            params[name] = bp
            stats[name] = bs

    params["bn2"], stats["bn2"] = _bn_from(sd, "bn2")
    params["fc"] = {"kernel": _dense_flat(sd["fc.weight"], 512),
                    "bias": _np(sd["fc.bias"])}
    # features BN1d: scale is frozen at 1.0 in the reference (iresnet.py:99-100);
    # the rebuild models it with use_scale=False.
    feat_scale = _np(sd["features.weight"])
    if not np.allclose(feat_scale, 1.0, atol=1e-5):
        raise ValueError("features BN scale expected frozen at 1.0")
    params["features"] = {"bias": _np(sd["features.bias"])}
    stats["features"] = {"mean": _np(sd["features.running_mean"]),
                         "var": _np(sd["features.running_var"])}
    return {"params": params, "batch_stats": stats}


def backbone_from_torch(name: str, sd: Dict[str, Any],
                        scan_blocks: bool = False) -> Dict[str, Any]:
    if name.startswith("sphnet"):
        depth = 20 if name == "sphnet20" else 64
        v = sphnet_from_torch(sd, depth)
        if scan_blocks:
            v = {"params": sphnet_scan_params(v["params"], depth)}
        return v
    if name.startswith("iresnet"):
        depth = int(name[len("iresnet"):])
        v = iresnet_from_torch(sd, depth)
        if scan_blocks:
            v = iresnet_scan_variables(v, depth)
        return v
    raise ValueError(f"unknown backbone '{name}'")


def _stack_subtrees(subtrees):
    """List of identical pytrees (nested dicts of arrays) -> stacked tree."""
    first = subtrees[0]
    if isinstance(first, dict):
        return {k: _stack_subtrees([t[k] for t in subtrees]) for k in first}
    return np.stack([np.asarray(t) for t in subtrees])


def _unstack_subtree(tree, idx):
    if isinstance(tree, dict):
        return {k: _unstack_subtree(v, idx) for k, v in tree.items()}
    return np.asarray(tree)[idx]


def iresnet_scan_variables(variables: Dict[str, Any], depth: int) -> Dict[str, Any]:
    """Unrolled iresnet variables -> scan_blocks layout (per-stage stacks)."""
    out = {}
    for coll in variables:
        src = variables[coll]
        dst: Dict[str, Any] = {}
        for key in src:
            import re

            m = re.match(r"layer(\d)_block(\d+)$", key)
            if not m:
                dst[key] = src[key]
        for stage, blocks in enumerate(_IRES_LAYERS[depth], start=1):
            dst[f"layer{stage}_block0"] = src[f"layer{stage}_block0"]
            if blocks > 1:
                rest = [src[f"layer{stage}_block{b}"] for b in range(1, blocks)]
                dst[f"layer{stage}_blocks"] = {"block": _stack_subtrees(rest)}
        out[coll] = dst
    return out


def iresnet_unscan_variables(variables: Dict[str, Any], depth: int) -> Dict[str, Any]:
    out = {}
    for coll in variables:
        src = variables[coll]
        dst: Dict[str, Any] = {k: v for k, v in src.items()
                               if not k.endswith("_blocks")}
        for stage, blocks in enumerate(_IRES_LAYERS[depth], start=1):
            if blocks > 1:
                stacked = src[f"layer{stage}_blocks"]["block"]
                for b in range(1, blocks):
                    dst[f"layer{stage}_block{b}"] = _unstack_subtree(stacked, b - 1)
        out[coll] = dst
    return out


def iresnet_to_torch(variables: Dict[str, Any], depth: int) -> Dict[str, Any]:
    import torch

    p = variables["params"]
    st = variables["batch_stats"]

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x, dtype=np.float32)))

    sd: Dict[str, Any] = {}

    def put_bn(key, bp, bs):
        sd[f"{key}.weight"] = t(bp["scale"])
        sd[f"{key}.bias"] = t(bp["bias"])
        sd[f"{key}.running_mean"] = t(bs["mean"])
        sd[f"{key}.running_var"] = t(bs["var"])
        sd[f"{key}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)

    sd["conv1.weight"] = t(_conv_back(np.asarray(p["conv1"]["kernel"])))
    put_bn("bn1", p["bn1"], st["bn1"])
    sd["prelu.weight"] = t(p["prelu"]["alpha"])
    inplanes = 64
    for stage, (blocks, feats) in enumerate(zip(_IRES_LAYERS[depth], (64, 128, 256, 512)), start=1):
        for b in range(blocks):
            name = f"layer{stage}_block{b}"
            tb = f"layer{stage}.{b}"
            bp, bs = p[name], st[name]
            put_bn(f"{tb}.bn1", bp["bn1"], bs["bn1"])
            sd[f"{tb}.conv1.weight"] = t(_conv_back(np.asarray(bp["conv1"]["kernel"])))
            put_bn(f"{tb}.bn2", bp["bn2"], bs["bn2"])
            sd[f"{tb}.prelu.weight"] = t(bp["prelu"]["alpha"])
            sd[f"{tb}.conv2.weight"] = t(_conv_back(np.asarray(bp["conv2"]["kernel"])))
            put_bn(f"{tb}.bn3", bp["bn3"], bs["bn3"])
            stride = 2 if b == 0 else 1
            if stride != 1 or inplanes != feats:
                sd[f"{tb}.downsample.0.weight"] = t(
                    _conv_back(np.asarray(bp["ds_conv"]["kernel"])))
                put_bn(f"{tb}.downsample.1", bp["ds_bn"], bs["ds_bn"])
            inplanes = feats
    put_bn("bn2", p["bn2"], st["bn2"])
    sd["fc.weight"] = t(_dense_flat_back(np.asarray(p["fc"]["kernel"]), 512))
    sd["fc.bias"] = t(p["fc"]["bias"])
    sd["features.weight"] = t(np.ones(p["fc"]["kernel"].shape[1], np.float32))
    sd["features.bias"] = t(p["features"]["bias"])
    sd["features.running_mean"] = t(st["features"]["mean"])
    sd["features.running_var"] = t(st["features"]["var"])
    sd["features.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
    return sd


def backbone_to_torch(name: str, variables: Dict[str, Any]) -> Dict[str, Any]:
    # the reference modules hardcode the 112x112 geometry (fc(512*7*7 -> E),
    # iresnet.py:97 / sphnet.py:52); a flax net trained at another image size
    # has a different fc in-dim and CANNOT round-trip to a torch state_dict —
    # raise the NotImplementedError every save path catches (-> .npz fallback)
    if name.startswith(("sphnet", "iresnet")):
        fc_in = int(variables["params"]["fc"]["kernel"].shape[0])
        if fc_in != 512 * 7 * 7:
            raise NotImplementedError(
                f"torch export of '{name}' assumes the reference 112x112 "
                f"input geometry (fc in-dim 25088, got {fc_in}); the "
                f"checkpoint is saved as .npz instead")
    if name.startswith("sphnet"):
        depth = 20 if name == "sphnet20" else 64
        if "params" in variables and any(k.endswith("_blocks")
                                         for k in variables["params"]):
            variables = {"params": sphnet_unscan_params(variables["params"], depth)}
        return sphnet_to_torch(variables, depth)
    if name.startswith("iresnet"):
        depth = int(name[len("iresnet"):])
        if "params" in variables and any(k.endswith("_blocks")
                                         for k in variables["params"]):
            variables = iresnet_unscan_variables(variables, depth)
        return iresnet_to_torch(variables, depth)
    raise NotImplementedError(f"to_torch for '{name}' not implemented yet")


# ---------------------------------------------------------------- BCE module

def bce_from_torch(sd: Dict[str, Any], converter_layers: int = 1) -> Dict[str, Any]:
    """torch BCE_module state_dict -> flax BCEModule params."""
    params: Dict[str, Any] = {
        "weight": _np(sd["weight"]),
        "bias": _np(sd["bias"]),
    }
    if converter_layers == 1:
        params["converter"] = {"dense": {"kernel": _dense(sd["converter.0.weight"]),
                                         "bias": _np(sd["converter.0.bias"])}}
    else:
        conv: Dict[str, Any] = {}
        for i in range(1, 5):
            conv[f"br{i}_dense1"] = {"kernel": _dense(sd[f"converter.br{i}.0.weight"]),
                                     "bias": _np(sd[f"converter.br{i}.0.bias"])}
            conv[f"br{i}_dense2"] = {"kernel": _dense(sd[f"converter.br{i}.2.weight"]),
                                     "bias": _np(sd[f"converter.br{i}.2.bias"])}
        conv["concat_fc"] = {"kernel": _dense(sd["converter.concat_fc.weight"]),
                             "bias": _np(sd["converter.concat_fc.bias"])}
        params["converter"] = conv
    return {"params": params}


def bce_to_torch(variables: Dict[str, Any], converter_layers: int = 1) -> Dict[str, Any]:
    import torch

    p = variables["params"]

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x, dtype=np.float32)))

    sd = {"weight": t(p["weight"]), "bias": t(p["bias"])}
    if converter_layers == 1:
        sd["converter.0.weight"] = t(np.asarray(p["converter"]["dense"]["kernel"]).T)
        sd["converter.0.bias"] = t(p["converter"]["dense"]["bias"])
    else:
        raise NotImplementedError
    return sd


def load_pth(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def save_pth(sd: Dict[str, Any], path: str) -> None:
    import torch

    # atomic: a watchdog/deadman SIGKILL mid-save must not leave a truncated
    # fc.pth/backbone.pth that a later --skip_pretrain/resume session
    # silently trusts as complete
    tmp = path + ".tmp"
    torch.save(sd, tmp)
    os.replace(tmp, path)
