"""Minimal `monai` stand-in so the reference repo's networks run on plain
torch (monai is not installed in this environment).

The reference tree at /root/reference forks most of the MONAI modules it
uses (factories, Convolution/ADN, patch embedding, layer utils) — those
forks are aliased back onto their `monai.*` import paths so the reference
runs 100% its own code.  What actually needs implementing here is the
true-monai remainder the forks and nets import:

  * `monai.utils`: `ensure_tuple_rep`, `look_up_option`, `optional_import`,
    `alias`, `export`, `deprecated_arg`, `SkipMode`, `has_option`,
    (swin_unetr.py:20, unet.py:24, simplelayers.py:5, layers/utils.py:17)
  * `monai.networks.layers`: `trunc_normal_`, `DropPath`, `Conv`
    (window_attention.py:6, swin_transformer_block.py:10,
    patch_embedding.py:20)
  * `monai.networks.layers.convutils`: `same_padding`,
    `stride_minus_kernel_padding` (convolutions.py:21)
  * `monai.networks.blocks`: `MLPBlock` (mlp), `SABlock` (selfattention),
    `PatchEmbeddingBlock` (patchembedding → aliased to the reference's own
    fork) (swin_transformer_block.py:9, transformer_block.py:16-17,
    vit.py:19)

Implementations follow monai~=1.1.0 (the reference's pinned version,
requirements.txt) semantics for exactly the argument ranges the reference
nets use; forward behavior in eval mode is what the golden parity tests
certify.
"""

from __future__ import annotations

import enum
import inspect
import sys
import types
from typing import Sequence


def _ensure_tuple_rep(val, dim: int) -> tuple:
    if isinstance(val, (int, float)):
        return (val,) * dim
    if isinstance(val, (list, tuple)):
        if len(val) == dim:
            return tuple(val)
        raise ValueError(f"sequence must have length {dim}, got {len(val)}")
    try:
        return tuple(val)
    except TypeError:
        return (val,) * dim


def _look_up_option(opt, supported):
    if isinstance(supported, type) and issubclass(supported, enum.Enum):
        if isinstance(opt, supported):
            return opt
        try:
            return supported(opt)
        except ValueError:
            pass
        try:
            return supported[str(opt).upper()]
        except KeyError:
            raise ValueError(f"unsupported option {opt!r} for {supported}")
    if isinstance(supported, dict):
        if opt in supported:
            return supported[opt]
        lower = str(opt).lower()
        if lower in supported:
            return supported[lower]
        raise ValueError(f"unsupported option {opt!r}, available: "
                         f"{sorted(map(str, supported))}")
    if opt in supported:
        return opt
    raise ValueError(f"unsupported option {opt!r}, available: "
                     f"{sorted(map(str, supported))}")


def _optional_import(module: str, version: str = "", version_checker=None,
                     name: str = "", descriptor: str = "", **_):
    try:
        mod = __import__(module, fromlist=[name] if name else [])
        return (getattr(mod, name) if name else mod), True
    except (ImportError, AttributeError):
        return None, False


def _alias(*names):
    def deco(obj):
        return obj
    return deco


def _export(modname):
    def deco(obj):
        return obj
    return deco


def _deprecated_arg(*a, **k):
    def deco(fn):
        return fn
    return deco


class _SkipMode(enum.Enum):
    CAT = "cat"
    ADD = "add"
    MUL = "mul"


def _has_option(obj, keywords) -> bool:
    if not callable(obj):
        return False
    sig = inspect.signature(obj)
    if isinstance(keywords, str):
        keywords = [keywords]
    return all(k in sig.parameters for k in keywords)


def _same_padding(kernel_size, dilation=1):
    import numpy as np
    k = np.atleast_1d(kernel_size)
    d = np.atleast_1d(dilation)
    if np.any((k - 1) * d % 2 == 1):
        raise NotImplementedError(
            f"same padding not available for kernel_size={kernel_size} "
            f"and dilation={dilation}")
    padding = tuple(int(p) for p in (k - 1) / 2 * d)
    return padding if len(padding) > 1 else padding[0]


def _stride_minus_kernel_padding(kernel_size, stride):
    import numpy as np
    out = tuple(int(p) for p in
                np.atleast_1d(stride) - np.atleast_1d(kernel_size))
    return out if len(out) > 1 else out[0]


def _build_torch_layers(torch):
    """MLPBlock / SABlock / DropPath / trunc_normal_ per monai 1.1.0."""
    nn = torch.nn

    def trunc_normal_(tensor, mean: float = 0.0, std: float = 1.0,
                      a: float = -2.0, b: float = 2.0):
        # init-only: parity tests copy weights, so clamp-normal suffices
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std + mean,
                                             max=b * std + mean)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
            super().__init__()
            self.drop_prob = float(drop_prob)
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if keep > 0.0 and self.scale_by_keep:
                mask.div_(keep)
            return x * mask

    class MLPBlock(nn.Module):
        """monai.networks.blocks.mlp.MLPBlock: linear1→act→drop1→linear2→drop2."""

        def __init__(self, hidden_size: int, mlp_dim: int,
                     dropout_rate: float = 0.0, act="GELU",
                     dropout_mode="vit"):
            super().__init__()
            mlp_dim = mlp_dim or hidden_size
            self.linear1 = nn.Linear(hidden_size, mlp_dim)
            self.linear2 = nn.Linear(mlp_dim, hidden_size)
            name = (act if isinstance(act, str) else act[0]).lower()
            acts = {"gelu": nn.GELU, "relu": nn.ReLU,
                    "leakyrelu": nn.LeakyReLU}
            self.fn = acts[name]()
            self.drop1 = nn.Dropout(dropout_rate)
            self.drop2 = self.drop1 if dropout_mode == "swin" \
                else nn.Dropout(dropout_rate)

        def forward(self, x):
            x = self.fn(self.linear1(x))
            x = self.drop1(x)
            x = self.linear2(x)
            return self.drop2(x)

    class SABlock(nn.Module):
        """monai.networks.blocks.selfattention.SABlock: packed qkv
        [3*(heads·dim)] split as (qkv, heads, dim) on the last axis."""

        def __init__(self, hidden_size: int, num_heads: int,
                     dropout_rate: float = 0.0, qkv_bias: bool = False,
                     save_attn: bool = False):
            super().__init__()
            if hidden_size % num_heads:
                raise ValueError("hidden size should be divisible by num_heads.")
            self.num_heads = num_heads
            self.head_dim = hidden_size // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(hidden_size, hidden_size * 3, bias=qkv_bias)
            self.out_proj = nn.Linear(hidden_size, hidden_size)
            self.drop_weights = nn.Dropout(dropout_rate)
            self.drop_output = nn.Dropout(dropout_rate)

        def forward(self, x):
            b, n, _ = x.shape
            qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, self.head_dim)
            qkv = qkv.permute(2, 0, 3, 1, 4)  # [qkv, b, heads, n, dim]
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (torch.einsum("blxd,blyd->blxy", q, k) * self.scale)
            att = att.softmax(dim=-1)
            att = self.drop_weights(att)
            out = torch.einsum("bhxy,bhyd->bhxd", att, v)
            out = out.permute(0, 2, 1, 3).reshape(b, n, -1)
            return self.drop_output(self.out_proj(out))

    return trunc_normal_, DropPath, MLPBlock, SABlock


def install_monai_stub(reference_root: str = "/root/reference") -> dict:
    """Register the `monai` module stubs in sys.modules (idempotent).

    `reference_root` must be on sys.path so the reference's own forks
    (networks.layers.factories, networks.blocks.convolutions, ...) can be
    aliased onto their monai import paths.  Returns the dict of inserted
    modules (callers may pop them to uninstall).
    """
    if "monai" in sys.modules:
        return {}
    import torch
    trunc_normal_, DropPath, MLPBlock, SABlock = _build_torch_layers(torch)

    monai = types.ModuleType("monai")
    utils = types.ModuleType("monai.utils")
    utils.ensure_tuple_rep = _ensure_tuple_rep
    utils.look_up_option = _look_up_option
    utils.optional_import = _optional_import
    utils.alias = _alias
    utils.export = _export
    utils.deprecated_arg = _deprecated_arg
    utils.SkipMode = _SkipMode
    utils.has_option = _has_option
    module_mod = types.ModuleType("monai.utils.module")
    module_mod.look_up_option = _look_up_option
    module_mod.optional_import = _optional_import
    utils.module = module_mod

    networks = types.ModuleType("monai.networks")
    layers = types.ModuleType("monai.networks.layers")
    convutils = types.ModuleType("monai.networks.layers.convutils")
    convutils.same_padding = _same_padding
    convutils.stride_minus_kernel_padding = _stride_minus_kernel_padding
    layers.convutils = convutils
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath

    blocks = types.ModuleType("monai.networks.blocks")
    mlp_mod = types.ModuleType("monai.networks.blocks.mlp")
    mlp_mod.MLPBlock = MLPBlock
    sa_mod = types.ModuleType("monai.networks.blocks.selfattention")
    sa_mod.SABlock = SABlock
    blocks.MLPBlock = MLPBlock
    blocks.SABlock = SABlock
    blocks.mlp = mlp_mod
    blocks.selfattention = sa_mod

    networks.layers = layers
    networks.blocks = blocks
    monai.utils = utils
    monai.networks = networks

    mods = {"monai": monai, "monai.utils": utils,
            "monai.utils.module": module_mod,
            "monai.networks": networks,
            "monai.networks.layers": layers,
            "monai.networks.layers.convutils": convutils,
            "monai.networks.blocks": blocks,
            "monai.networks.blocks.mlp": mlp_mod,
            "monai.networks.blocks.selfattention": sa_mod}
    sys.modules.update(mods)

    # alias the reference's OWN monai forks onto their monai import paths
    # (import AFTER the base stubs exist — the forks import monai.utils)
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    # each alias must hit sys.modules BEFORE the next fork import: the
    # stub modules are plain ModuleType (no __path__), so dotted imports
    # only resolve through explicit sys.modules entries
    import networks.layers.factories as ref_factories
    layers.factories = ref_factories
    layers.Conv = ref_factories.Conv
    sys.modules["monai.networks.layers.factories"] = ref_factories
    import networks.layers.utils as ref_layer_utils
    layers.utils = ref_layer_utils
    sys.modules["monai.networks.layers.utils"] = ref_layer_utils
    import networks.blocks.convolutions as ref_convolutions
    blocks.convolutions = ref_convolutions
    blocks.Convolution = ref_convolutions.Convolution
    sys.modules["monai.networks.blocks.convolutions"] = ref_convolutions
    import networks.blocks.patch_embedding as ref_patch_embedding
    blocks.patchembedding = ref_patch_embedding
    blocks.PatchEmbeddingBlock = ref_patch_embedding.PatchEmbeddingBlock
    sys.modules["monai.networks.blocks.patchembedding"] = ref_patch_embedding
    mods.update({
        "monai.networks.layers.factories": ref_factories,
        "monai.networks.layers.utils": ref_layer_utils,
        "monai.networks.blocks.convolutions": ref_convolutions,
        "monai.networks.blocks.patchembedding": ref_patch_embedding,
    })
    return mods
