"""Pretrained-weight ingest: torch checkpoints → flax param pytrees.

Reference parity:
  * `pre_swin_unetr` — MONAI's SSL-pretrained `model_swinvit.pt` is loaded
    with `module.` prefix strip + `fc1/fc2 → linear1/linear2` rename into
    `swinViT` with strict=False (networks/utils/utils.py:28-37).  Here the
    torch tensors are transposed into flax layouts (conv OIHW→HWIO-style,
    linear [out,in]→[in,out]) and merged by path.
  * `--pretrained` partial fine-tune load that skips mismatched output
    heads (networks/utils/utils.py:42-63) → `partial_load`: shape-matched
    pytree merge with a load report.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np


def _flatten(tree: dict, prefix: tuple = ()) -> dict[tuple, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: dict[tuple, Any]) -> dict:
    out: dict = {}
    for path, v in flat.items():
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return out


def partial_load(params: dict, source: dict, *, verbose: bool = True) -> dict:
    """Merge `source` into `params` wherever path AND shape match.

    The reference's output-head skipping (utils.py:42-63) falls out
    naturally: mismatched `out` conv shapes are reported and kept at init.
    """
    tgt = _flatten(params)
    src = _flatten(source)
    loaded, skipped, missing = [], [], []
    merged = {}
    for path, val in tgt.items():
        if path in src:
            sval = np.asarray(src[path])
            if tuple(sval.shape) == tuple(np.asarray(val).shape):
                merged[path] = sval.astype(np.asarray(val).dtype)
                loaded.append(path)
            else:
                merged[path] = val
                skipped.append((path, tuple(sval.shape), tuple(np.asarray(val).shape)))
        else:
            merged[path] = val
            missing.append(path)
    unexpected = [p for p in src if p not in tgt]
    if verbose:
        print(f"partial_load: loaded {len(loaded)}, shape-skipped {len(skipped)}, "
              f"missing {len(missing)}, unexpected {len(unexpected)}")
        for path, s, t in skipped:
            print(f"  skipped {'/'.join(path)}: ckpt {s} != model {t} "
                  "(output layer kept at init)")
    return _unflatten(merged)


def _torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "").replace("fc1", "linear1").replace("fc2", "linear2")
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _swin_vit_flax_tree(sd: dict[str, np.ndarray]) -> dict:
    """Torch swin-ViT state dict → flax subtree for our `SwinTransformer`."""
    flat: dict[tuple, np.ndarray] = {}

    def put(path: str, val: np.ndarray):
        flat[tuple(path.split("/"))] = val

    for key, v in sd.items():
        parts = key.split(".")
        if key == "patch_embed.proj.weight":
            # torch conv [O, I, *k] → flax [*k, I, O]
            put("patch_embed/proj/kernel", np.transpose(v, (*range(2, v.ndim), 1, 0)))
        elif key == "patch_embed.proj.bias":
            put("patch_embed/proj/bias", v)
        elif parts[0].startswith("layers") and len(parts) > 2:
            layer = parts[0]  # layers1..layers4
            if parts[2] == "blocks":
                blk = f"blocks_{parts[3]}"
                rest = parts[4:]
                base = f"{layer}/{blk}"
                if rest[0] in ("norm1", "norm2"):
                    put(f"{base}/{rest[0]}/{'scale' if rest[1] == 'weight' else 'bias'}", v)
                elif rest[0] == "attn":
                    if rest[1] == "relative_position_bias_table":
                        put(f"{base}/attn/relative_position_bias_table", v)
                    elif rest[1] in ("qkv", "proj") and rest[2] == "weight":
                        put(f"{base}/attn/{rest[1]}/kernel", v.T)
                    elif rest[1] in ("qkv", "proj") and rest[2] == "bias":
                        put(f"{base}/attn/{rest[1]}/bias", v)
                elif rest[0] == "mlp":
                    if rest[2] == "weight":
                        put(f"{base}/mlp/{rest[1]}/kernel", v.T)
                    else:
                        put(f"{base}/mlp/{rest[1]}/bias", v)
            elif parts[2] == "downsample":
                base = f"{layer}/downsample"
                if parts[3] == "reduction" and parts[4] == "weight":
                    put(f"{base}/reduction/kernel", v.T)
                elif parts[3] == "norm":
                    put(f"{base}/norm/{'scale' if parts[4] == 'weight' else 'bias'}", v)
    return _unflatten(flat)


def load_swin_vit_torch(path: str | Path, params: dict,
                        subtree: str = "swinViT", *, verbose: bool = True) -> dict:
    """Load MONAI `model_swinvit.pt` into `params[subtree]` (strict=False)."""
    sd = _torch_state_dict(path)
    # the SSL checkpoint nests the backbone under swinViT.
    sd = {k[len("swinViT."):] if k.startswith("swinViT.") else k: v
          for k, v in sd.items()}
    src = _swin_vit_flax_tree(sd)
    params = dict(params)
    params[subtree] = partial_load(params[subtree], src, verbose=verbose)
    return params
