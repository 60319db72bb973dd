"""Import reference (PyTorch MI-Seg / MONAI) checkpoints into our params.

Reference checkpoint surface (SURVEY §5 checkpoint/resume):
  * PTL `.ckpt` — `checkpoint["state_dict"]` with `model.`-prefixed keys
    (networks/lightning_monai.py);
  * raw `.pt` dicts — `{epoch, best_acc, state_dict, ...}` (tune.py:27-38);
  * MONAI `model_swinvit.pt` — see `pretrained.load_swin_vit_torch`.

Translates full-model torch state dicts (UNETR / SwinUNETR / UNet /
UNetVanilla as the reference's modules name them) into our flax paths,
with layout transposes:
  conv        [O, I, *k]  → [*k, I, O]
  conv-transp [I, O, *k]  → [*k, I, O]
  linear      [O, I]      → [I, O]
  cond-norm bank  norms.{i}.{weight,bias} rows → stacked [num_styles, C]
  PReLU       weight → slope

Structural renames (torch module tree → our flax tree):
  recursive UNet Sequential indices  model.0/1.submodule/2 →
      down / sub|bottom / up (+ up.1 → up_ru)
  ResidualUnit container             .conv.unitN → .unitN
  swin stages                        layersN.0 → layersN; blocks.N → blocks_N
  UnetrPrUpBlock                     blocks.N(.0|.conv) → upN; blocks.N.1 → blockN
  MONAI SABlock                      out_proj → proj
  perceptron patch embed             patch_embeddings.1 → patch_embeddings
  UNetVanilla paths                  down_path.i.j → down_path_i_j;
                                     up_path.i.1 → up_path_i
  transposed Convolution wrappers    <...>.conv.weight → <...>/kernel

Merging is shape-checked (`pretrained.partial_load`), so mismatched output
heads are skipped exactly like the reference's utils.py:42-63.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

from .pretrained import _unflatten, partial_load

_UNIT_RE = re.compile(r"unit\d+$")
_LAYERS_RE = re.compile(r"layers\d+$")
_UP_RE = re.compile(r"up\d+$")


def _to_numpy(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _conv_kernel(v):  # [O, I, *k] → [*k, I, O]
    v = _to_numpy(v)
    return np.transpose(v, (*range(2, v.ndim), 1, 0))


def _deconv_kernel(v):  # [I, O, *k] → [*k, I, O]
    v = _to_numpy(v)
    return np.transpose(v, (*range(2, v.ndim), 0, 1))


def _module_path(dotted: str) -> list[str]:
    toks = dotted.split(".")
    out: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        nxt = toks[i + 1] if i + 1 < n else ""
        if t == "conv" and _UNIT_RE.fullmatch(nxt or ""):
            i += 1  # ResidualUnit's Sequential container
            continue
        if t == "blocks" and nxt.isdigit():
            after = toks[i + 2] if i + 2 < n else ""
            if after == "0":            # PrUpBlock Sequential(transp, block)
                out.append(f"up{nxt}")
                i += 3
                continue
            if after == "1":
                out.append(f"block{nxt}")
                i += 3
                continue
            if after == "conv":         # PrUpBlock without conv_block
                out.append(f"up{nxt}")
                i += 2
                continue
            out.append(f"blocks_{nxt}")  # swin / ViT block list
            i += 2
            continue
        if _LAYERS_RE.fullmatch(t) and nxt == "0":
            out.append(t)
            i += 2
            continue
        if t == "out_proj":
            out.append("proj")
            i += 1
            continue
        if t == "patch_embeddings" and nxt == "1":
            out.append(t)
            i += 2
            continue
        if t == "down_path" and nxt.isdigit():
            j = toks[i + 2] if i + 2 < n else "0"
            out.append(f"down_path_{nxt}_{j}")
            i += 3
            continue
        if t == "up_path" and nxt.isdigit():
            out.append(f"up_path_{nxt}")
            # skip the Sequential index (0=Upsample paramless, 1=ResidualUnit)
            i += 3 if i + 2 < n and toks[i + 2] in ("0", "1") else 2
            continue
        if t.isdigit() and out and out[-1] in ("model", "sub"):
            if t == "0":
                out.append("down")
                i += 1
            elif t == "2":
                out.append("up")
                i += 1
            else:  # "1" → SkipConnection; consume "submodule"
                i += 1
                if i < n and toks[i] == "submodule":
                    i += 1
                nxt2 = toks[i] if i < n else ""
                out.append("sub" if nxt2.isdigit() else "bottom")
            continue
        if t.isdigit() and out and out[-1] == "up":
            if t == "1":
                out[-1] = "up_ru"
            i += 1  # "0" stays the transposed Convolution itself
            continue
        out.append(t)
        i += 1
    return out


def _is_transposed(path: list[str]) -> bool:
    return any(p in ("transp_conv", "transp_conv_init") or _UP_RE.fullmatch(p)
               or p == "up" for p in path)


def _translate_key(key: str, v):
    if key.endswith("relative_position_index") or \
            key.endswith("num_batches_tracked"):
        return None, None
    if "." not in key:
        return None, None
    mod, leaf = key.rsplit(".", 1)
    path = _module_path(mod)
    val = _to_numpy(v)

    if leaf == "weight":
        if val.ndim >= 3:
            if _is_transposed(path):
                if path and path[-1] == "conv":
                    path = path[:-1]  # our transposed conv holds the kernel
                return path + ["kernel"], _deconv_kernel(val)
            return path + ["kernel"], _conv_kernel(val)
        if val.ndim == 2:
            return path + ["kernel"], val.T
        if path and path[-1] == "A":
            return path + ["slope"], val  # PReLU
        return path + ["scale"], val      # norm affine
    if leaf == "bias":
        return path + ["bias"], val
    return path + [leaf], val


def translate_reference_state_dict(sd: dict) -> dict:
    """Torch state dict (reference naming) → nested flax param dict."""
    norm_sd: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = re.sub(r"^module\.", "", k)  # DDP wrapper
        # Lightning wraps the net as `self.model`; the recursive UNet's own
        # top Sequential is ALSO named `model` (its children are digits) —
        # strip only the Lightning wrapper, never UNet's root.
        if k.startswith("model.") and not re.match(r"^model\.\d", k):
            k = k[len("model."):]
        k = k.replace(".fc1.", ".linear1.").replace(".fc2.", ".linear2.")
        norm_sd[k] = v

    banks: dict[str, dict[int, np.ndarray]] = {}
    flat: dict[tuple, np.ndarray] = {}
    for key, v in norm_sd.items():
        m = re.match(r"^(.*)\.norms\.(\d+)\.(weight|bias)$", key)
        if m:  # conditional-norm parameter bank rows
            banks.setdefault(f"{m.group(1)}|{m.group(3)}", {})[
                int(m.group(2))] = _to_numpy(v)
            continue
        path, val = _translate_key(key, v)
        if path is not None:
            flat[tuple(path)] = val

    for bank_key, rows in banks.items():
        base, kind = bank_key.split("|")
        stacked = np.stack([rows[i] for i in sorted(rows)])
        leaf = "scale" if kind == "weight" else "bias"
        flat[tuple(_module_path(base) + [leaf])] = stacked
    return _unflatten(flat)


def load_reference_checkpoint(path: str | Path, params: dict, *,
                              verbose: bool = True) -> dict:
    """Load a reference .pt/.ckpt into our params (shape-checked merge)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    src = translate_reference_state_dict(sd)
    return partial_load(params, src, verbose=verbose)
