"""Full-model weight translation: reference torch state dicts → flax params.

Lets a user of the reference framework bring trained checkpoints of ANY of
its model families (C-UNet / C-UNETR / C-Swin-UNETR and their plain
variants) straight into miseg_tpu, and powers the golden full-model parity
tests (forward equality with copied weights).

Name grammar per family (verified against the reference nets' state
dicts):
  * swin_unetr (networks/nets/swin_unetr.py): `swinViT.layersK.0.blocks.J`
    → `swinViT/layersK/blocks_J`; `encoderN.layer.*` / `decoderN.*` /
    `out.conv.*` keep their names; `transp_conv.conv.weight` is a torch
    ConvTranspose kernel.
  * unetr (networks/nets/unetr.py): `vit.blocks.J` → `vit/blocks_J`,
    `attn.out_proj` → `attn/proj`; `encoderN.blocks.I.0` (ConvTranspose)
    → `encoderN/upI`, `encoderN.blocks.I.1` → `encoderN/blockI`.
  * unet / unet_vanilla (networks/nets/unet.py): the recursive Sequential
    `model.0` → `model/down`, `model.1.submodule…` → `model/sub/…` (the
    deepest non-Sequential submodule is `bottom`), `model.2.0` →
    `up` (ConvTranspose+ADN), `model.2.1` → `up_ru`;
    `conv.unitK` → `unitK`; ADN activation `A.weight` (PReLU) → `A/slope`.

Tensor layouts:
  * conv `[O, I, *k]` → `[*k, I, O]`;
  * ConvTranspose `[I, O, *k]` → spatially flipped `[*k, I, O]` (our
    `conv_transpose` runs lax.conv_transpose with transpose_kernel=False);
  * linear `[out, in]` → `[in, out]`;
  * conditional-norm banks `….norms.S.{weight,bias}` → stacked
    `[num_styles, C]` `scale`/`bias`;
  * 1-D `weight` → `scale`; `relative_position_index` buffers are dropped
    (static in our modules).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Iterator

import numpy as np

from .pretrained import _torch_state_dict, _unflatten, partial_load


def _conv_kernel(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (*range(2, v.ndim), 1, 0))


def _convT_kernel(v: np.ndarray) -> np.ndarray:
    spatial = tuple(range(v.ndim - 2))
    return np.flip(np.transpose(v, (*range(2, v.ndim), 0, 1)),
                   axis=spatial).copy()


def _leaf(path: list[str], key_tail: str, v: np.ndarray,
          transposed: bool) -> tuple[tuple, np.ndarray] | None:
    """Map one torch leaf (already path-renamed) to a flax (path, value)."""
    if key_tail == "relative_position_index":
        return None
    if key_tail == "relative_position_bias_table":
        return (*path, key_tail), v
    if key_tail == "position_embeddings":
        return (*path, key_tail), v
    if key_tail == "weight":
        if v.ndim >= 3:
            if transposed:
                return (*path, "kernel"), _convT_kernel(v)
            return (*path, "kernel"), _conv_kernel(v)
        if v.ndim == 2:
            return (*path, "kernel"), v.T
        if path and path[-1] == "A":  # PReLU inside ADN
            return (*path, "slope"), v
        return (*path, "scale"), v
    if key_tail == "bias":
        return (*path, "bias"), v
    raise ValueError(f"unhandled leaf {'.'.join(path)}.{key_tail} "
                     f"shape {v.shape}")


def _stack_norm_banks(entries: dict[tuple, np.ndarray]) -> dict[tuple, np.ndarray]:
    """Collapse `…/norms/S/{scale,bias}` per-style entries into stacked
    `[num_styles, C]` leaves (our conditional-norm layout)."""
    banks: dict[tuple, dict[int, np.ndarray]] = {}
    out: dict[tuple, np.ndarray] = {}
    for path, v in entries.items():
        if len(path) >= 3 and path[-3] == "norms":
            key = (*path[:-3], path[-1])  # drop 'norms', style index
            banks.setdefault(key, {})[int(path[-2])] = v
        else:
            out[path] = v
    for key, by_style in banks.items():
        out[key] = np.stack([by_style[s] for s in sorted(by_style)])
    return out


def _map_swin_unetr(key: str) -> tuple[list[str], bool] | None:
    parts = key.split(".")
    if parts[-1] == "relative_position_index":
        return None
    transposed = "transp_conv" in parts
    out: list[str] = []
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if re.fullmatch(r"layers\d", p):
            out.append(p)
            i += 1  # skip the '.0.' Sequential wrapper
            if i < len(parts) - 1 and parts[i] == "0":
                i += 1
            continue
        if p == "blocks":
            out.append(f"blocks_{parts[i + 1]}")
            i += 2
            continue
        if transposed and p == "conv" and parts[i - 1] == "transp_conv":
            i += 1  # our transposed conv holds `kernel` directly
            continue
        out.append(p)
        i += 1
    return out, transposed


def _map_unetr(key: str) -> tuple[list[str], bool] | None:
    parts = key.split(".")
    transposed = ("transp_conv" in parts or "transp_conv_init" in parts)
    out: list[str] = []
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if p == "blocks" and out and out[-1].startswith("encoder"):
            # encoderN.blocks.I.{0: ConvTranspose → upI, 1: block → blockI}
            idx, which = parts[i + 1], parts[i + 2]
            if which == "0":
                out.append(f"up{idx}")
                transposed = True
                i += 3
                if i < len(parts) - 1 and parts[i] == "conv":
                    i += 1  # transposed conv holds kernel directly
                continue
            out.append(f"block{idx}")
            i += 3
            continue
        if p == "blocks" and out and out[-1] == "vit":
            out.append(f"blocks_{parts[i + 1]}")
            i += 2
            continue
        if p == "out_proj":
            out.append("proj")
            i += 1
            continue
        if p == "patch_embeddings":
            out.append(p)
            i += 1
            # perceptron mode wraps Rearrange+Linear in a Sequential
            # (patch_embedding.py): skip the '.1.' index
            if i < len(parts) - 1 and parts[i].isdigit():
                i += 1
            continue
        if transposed and p == "conv" and \
                parts[i - 1] in ("transp_conv", "transp_conv_init"):
            i += 1
            continue
        out.append(p)
        i += 1
    return out, transposed


def _map_unet(key: str) -> tuple[list[str], bool] | None:
    parts = key.split(".")
    out: list[str] = ["model"]
    transposed = False
    i = 1  # parts[0] == 'model'
    while i < len(parts) - 1:
        p = parts[i]
        if p == "0" and out[-1] in ("model", "sub"):
            out.append("down")
            i += 1
        elif p == "1" and out[-1] in ("model", "sub"):
            # SkipConnection wrapper; next is 'submodule'
            i += 2
            if parts[i] in ("conv", "residual"):  # deepest: a ResidualUnit
                out.append("bottom")
            else:
                out.append("sub")
        elif p == "2" and out[-1] in ("model", "sub"):
            which = parts[i + 1]
            if which == "0":  # up: transposed Convolution (+ADN)
                out.append("up")
                transposed = True
                i += 2
                if i < len(parts) - 1 and parts[i] == "conv":
                    i += 1  # transposed conv holds kernel directly
            else:  # '1' → up residual unit
                out.append("up_ru")
                i += 2
        elif p == "conv" and i + 1 < len(parts) - 1 and \
                parts[i + 1].startswith("unit"):
            i += 1  # ResidualUnit's inner Sequential named 'conv'
        else:
            out.append(p)
            i += 1
    return out, transposed


_MAPPERS = {
    "swin_unetr": _map_swin_unetr,
    "pre_swin_unetr": _map_swin_unetr,
    "unetr": _map_unetr,
    "unet": _map_unet,
    "unet_vanilla": _map_unet,
}


def reference_to_flax(model_name: str, state_dict: dict[str, np.ndarray]) -> dict:
    """Translate a reference torch state dict into a flax param tree."""
    mapper = _MAPPERS.get(model_name)
    if mapper is None:
        raise ValueError(f"no reference import mapping for {model_name!r}")
    flat: dict[tuple, np.ndarray] = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        mapped = mapper(key)
        if mapped is None:
            continue
        path, transposed = mapped
        leaf = _leaf(path, key.split(".")[-1], v, transposed)
        if leaf is not None:
            flat[leaf[0]] = leaf[1]
    return _unflatten(_stack_norm_banks(flat))


def load_reference_checkpoint(path: str | Path, model_name: str,
                              params: dict, *, verbose: bool = True) -> dict:
    """Load a reference-framework checkpoint file into our params
    (shape-checked merge; mismatched output heads are kept at init, the
    reference's own strict=False semantics — utils/utils.py:42-63)."""
    sd = _torch_state_dict(path)
    return partial_load(params, reference_to_flax(model_name, sd),
                        verbose=verbose)
