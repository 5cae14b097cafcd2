"""Import PyTorch checkpoints (torchvision ResNets, reference CNSN
models) into cnsn_tpu parameter trees.

The reference loads torchvision/IBN pretrained weights with
``load_state_dict(..., strict=False)`` (imagenet.py:518-521) and resumes
its own DataParallel checkpoints (cifar.py:415-427).  This module maps
those state_dicts onto our NHWC Flax trees:

  conv weight (O, I, kH, kW) → kernel (kH, kW, I, O)
  grouped conv (O, I/g, kH, kW) → kernel (kH, kW, I/g, O)
  linear weight (O, I)       → kernel (I, O)
  BN weight/bias/running_mean/running_var → scale/bias + batch_stats
  SelfNorm g_fc (C, 1, 2)    → (C, 2)

Checkpoint keys may carry a 'module.' DataParallel prefix; it is
stripped.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

__all__ = ["convert_state_dict", "import_torch_checkpoint",
           "allconv_key_map"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray,
         strict: bool, dtype=np.float32):
    node = tree
    for p in path[:-1]:
        if p not in node:
            if strict:
                raise KeyError(f"missing path {'/'.join(path)}")
            return False
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"missing leaf {'/'.join(path)}")
        return False
    if tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{node[leaf].shape} vs {value.shape}")
    node[leaf] = value.astype(dtype)
    return True


def _translate(key: str) -> Tuple[Tuple[str, ...], str]:
    """Translate one torch dotted key into (module_path, leaf_kind).

    leaf_kind ∈ {conv, linear, scale, bias, mean, var, g_fc, f_fc}.
    Handles the structural renames between the reference modules and our
    NHWC tree: layerS.I → layerS_I, blockG.layer.I → blockG_I,
    downsample.0/1 → downsample_conv/bn, IBN 'IN'/'BN' children.
    """
    key = key.removeprefix("module.")
    parts = key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]

    out = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m.startswith("stage_") and i + 1 < len(mods) and \
                mods[i + 1].isdigit():
            # resnext stage_1.0 → stage1_0
            out.append(f"stage{m[len('stage_'):]}_{mods[i + 1]}")
            i += 2
        elif m.startswith("trans") and i + 1 < len(mods) and \
                mods[i + 1] in ("bn1", "conv1"):
            # densenet Transition trans1.bn1/conv1 → trans1_bn/trans1_conv
            out.append(f"{m}_{mods[i + 1][:-1]}")
            i += 2
        elif m == "layer" and out and i + 1 < len(mods) and \
                mods[i + 1].isdigit():
            # wideresnet NetworkBlock inner Sequential: merge into parent
            # (must precede the generic layerN rule: bare "layer" would
            # otherwise become a spurious "layer_0" path element)
            out[-1] = f"{out[-1]}_{mods[i + 1]}"
            i += 2
        elif m.startswith(("layer", "block", "stage", "dense")) and \
                i + 1 < len(mods) and mods[i + 1].isdigit():
            # layer1.0 → layer1_0 ; block1.layer.0 → block1_0
            out.append(f"{m}_{mods[i + 1]}")
            i += 2
        elif m == "downsample" and i + 1 < len(mods):
            out.append("downsample_conv" if mods[i + 1] == "0"
                       else "downsample_bn")
            i += 2
        elif m == "crossnorm":
            out.append("crossnorm")
            i += 1
        elif m == "selfnorm":
            out.append("selfnorm")
            i += 1
        else:
            out.append(m)
            i += 1

    kind = {"weight": "weight", "bias": "bias", "running_mean": "mean",
            "running_var": "var", "num_batches_tracked": "skip"}[leaf]
    return tuple(out), kind


def allconv_key_map(pos: int) -> Dict[str, str]:
    """Prefix map for the reference AllConvNet's ``features`` Sequential
    (models/cifar/allconv_cnsn.py:18-97): each conv entry expands to
    [conv, BN, GELU] with the CNSN spliced at index ``pos``, so the flat
    Sequential indices depend on pos.  Maps 'features.<seq>' onto our
    per-CFG-entry names conv_<li>/bn_<li>/cnsn_<li>."""
    cfg = (96, 96, 96, "Md", 192, 192, 192, "Md", "nopad", "NIN", "NIN", "A")
    m: Dict[str, str] = {}
    seq = 0
    for li, v in enumerate(cfg):
        if v == "Md":
            seq += 2  # maxpool, dropout (paramless)
            continue
        if v == "A":
            seq += 1
            continue
        idxs = {"conv": 0, "bn": 1}
        for k in idxs:
            if idxs[k] >= pos:
                idxs[k] += 1  # cnsn inserted before it
        m[f"features.{seq + idxs['conv']}"] = f"conv_{li}"
        m[f"features.{seq + idxs['bn']}"] = f"bn_{li}"
        m[f"features.{seq + pos}"] = f"cnsn_{li}"
        seq += 4
    return m


def convert_state_dict(state_dict: Mapping[str, Any],
                       params: Dict[str, Any],
                       batch_stats: Dict[str, Any],
                       strict: bool = False,
                       prefix: Tuple[str, ...] = (),
                       key_map: Mapping[str, str] | None = None,
                       dtype=np.float32):
    """Convert + load a torch state_dict into (params, batch_stats)
    copies.  Returns (params, batch_stats, missing_keys).

    ``prefix`` roots every translated path under a module (e.g.
    ('backbone',) to load a torchvision resnet into the segmentation
    backbone).  ``key_map`` rewrites dotted key prefixes before the
    generic translation (model-specific layouts, e.g. allconv_key_map).
    ``dtype`` is the storage dtype of the loaded leaves (np.float64 for
    the f64 lockstep harnesses)."""
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    missing = []

    for key, value in state_dict.items():
        if key_map:
            k = key.removeprefix("module.")
            for pre, repl in key_map.items():
                if k == pre or k.startswith(pre + "."):
                    key = repl + k[len(pre):]
                    break
        path, kind = _translate(key)
        path = prefix + path
        if kind == "skip":
            continue
        v = _np(value)
        ok = False
        if kind == "weight":
            if v.ndim == 4:  # conv OIHW → HWIO
                ok = _set(params, path + ("kernel",),
                          v.transpose(2, 3, 1, 0), strict, dtype)
            elif v.ndim == 3:  # SelfNorm grouped Conv1d (C,1,2) → (C,2)
                parent = path[:-1] + (path[-1],)
                ok = _set(params, parent, v[:, 0, :], strict, dtype)
            elif v.ndim == 2:  # linear OI → IO
                ok = _set(params, path + ("kernel",), v.T, strict, dtype)
            elif v.ndim == 1:  # norm scale
                ok = _set(params, path + ("scale",), v, strict, dtype)
        elif kind == "bias":
            # linear bias and norm bias share the leaf name "bias"
            ok = _set(params, path + ("bias",), v, strict, dtype)
        elif kind in ("mean", "var"):
            ok = _set(batch_stats, path + (kind,), v, strict, dtype)
        if not ok:
            missing.append(key)

    return params, batch_stats, missing


def import_torch_checkpoint(path: str, variables: Dict[str, Any],
                            strict: bool = False):
    """Load a .pth/.pt file and map it onto a Flax variables dict."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    params, batch_stats, missing = convert_state_dict(
        payload, dict(variables["params"]),
        dict(variables.get("batch_stats", {})), strict=strict)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = batch_stats
    return out, missing
