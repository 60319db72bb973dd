"""Swin Transformer backbone (hierarchical, shifted-window attention).

Reference parity: `SwinTransformer` + `BasicLayer`
(networks/nets/swin_transformer.py:27-257) —
patch embed (stride = patch_size) → 4 stages; each stage: `depth`×
SwinTransformerBlock with alternating shift (even blocks unshifted, odd
shifted by window//2), a static shifted-window mask over the padded dims,
then `PatchMerging` downsample.  `proj_out` re-normalizes every stage
output with a PARAMETER-FREE layer/instance norm (swin_transformer.py:
121-145; `instance_cond` deliberately uses the plain parameter-free
instance norm — replicated per SURVEY §7.4).  Returns the 5-level feature
pyramid [x0..x4].

TPU-first: masks are numpy precomputes keyed on static padded dims;
`use_checkpoint` maps to `jax.checkpoint` (flax `nn.remat`) around each
swin block, trading FLOPs for HBM exactly like the reference's
`torch.utils.checkpoint` (swin_transformer_block.py:243-249).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import numpy as np

from ..nn.swin import PatchEmbed, PatchMergingV2, SwinTransformerBlock
from ..ops.norms import instance_norm, layer_norm
from ..ops.window import get_window_size, window_region_ids

NormSpec = tuple[str, dict[str, Any]] | str


def _kind(norm: NormSpec) -> str:
    return norm if isinstance(norm, str) else norm[0]


class BasicLayer(nn.Module):
    """One swin stage: blocks with alternating shift + optional downsample."""

    dim: int
    depth: int
    num_heads: int
    window_size: Sequence[int]
    drop_path: Sequence[float] = ()
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    downsample: str | None = None  # "merging" | "mergingv2" | None
    use_checkpoint: bool = False
    norm: NormSpec = ("layer", {})

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        spatial = x.shape[1:-1]
        window_size, shift_size = get_window_size(
            spatial, tuple(self.window_size),
            tuple(w // 2 for w in self.window_size))
        padded = tuple(int(math.ceil(s / w)) * w for s, w in zip(spatial, window_size))
        # region ids, not the additive [nW, N, N] mask — consumers fuse the
        # pairwise comparison (ops/window.py:window_region_ids)
        attn_mask = window_region_ids(padded, tuple(window_size), tuple(shift_size))
        no_shift = (0,) * len(window_size)

        block_cls = SwinTransformerBlock
        if self.use_checkpoint:
            block_cls = nn.remat(SwinTransformerBlock, static_argnums=(4,))
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            blk = block_cls(
                dim=self.dim, num_heads=self.num_heads,
                window_size=tuple(self.window_size),
                shift_size=no_shift if i % 2 == 0 else tuple(w // 2 for w in self.window_size),
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop, drop_path=dp,
                norm=self.norm, name=f"blocks_{i}")
            mask = attn_mask if any(s for s in (shift_size if i % 2 else no_shift)) else None
            x = blk(x, mask, modalities, train)

        if self.downsample is not None:
            x = PatchMergingV2(dim=self.dim, norm=self.norm,
                               legacy=self.downsample == "merging",
                               name="downsample")(x, modalities, train=train)
        return x


class SwinTransformer(nn.Module):
    in_chans: int
    embed_dim: int
    window_size: Sequence[int]
    patch_size: Sequence[int]
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    patch_norm: bool = False
    use_checkpoint: bool = False
    downsample: str = "merging"
    norm: NormSpec = ("layer", {})

    def _proj_out(self, x, normalize: bool):
        """Parameter-free per-stage re-normalization (proj_out, :121-145)."""
        if not normalize:
            return x
        kind = _kind(self.norm)
        if kind == "layer":
            return layer_norm(x)
        if kind in ("instance", "instance_cond"):
            return instance_norm(x)
        return x

    @nn.compact
    def __call__(self, x, normalize: bool = True, modalities=None, *,
                 train: bool = False):
        num_layers = len(self.depths)
        x0 = PatchEmbed(patch_size=tuple(self.patch_size),
                        embed_dim=self.embed_dim,
                        norm=self.norm if self.patch_norm else None,
                        name="patch_embed")(x, modalities, train=train)
        x0 = nn.Dropout(rate=self.drop_rate)(x0, deterministic=not train)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        outs = [self._proj_out(x0, normalize)]
        h = x0
        for i in range(num_layers):
            h = BasicLayer(
                dim=int(self.embed_dim * 2 ** i), depth=self.depths[i],
                num_heads=self.num_heads[i], window_size=tuple(self.window_size),
                drop_path=dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])],
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                downsample=self.downsample, use_checkpoint=self.use_checkpoint,
                norm=self.norm, name=f"layers{i + 1}")(h, modalities, train=train)
            outs.append(self._proj_out(h, normalize))
        return outs
