"""Swin transformer blocks: window attention, shifted-window block,
patch merging, patch embedding.

Reference parity:
  * `WindowAttention` (networks/blocks/window_attention.py:16-121) —
    windowed MHSA with (2w-1)^nd relative-position-bias table;
  * `SwinTransformerBlock` (networks/blocks/swin_transformer_block.py:24-251)
    — norm → pad → cyclic roll → window partition → attention → reverse →
    unroll → crop, then norm → MLP, both with DropPath;
  * `PatchMergingV2` / legacy `PatchMerging`
    (networks/blocks/patch_merging.py:20-142) — 2^nd space-to-channel
    concat → norm → Linear(2^nd·c → 2c, no bias); the legacy variant keeps
    MONAI v0.9's slice ordering including its duplicated x5/x6 slices
    (:120-128) for checkpoint compatibility;
  * `PatchEmbed` (networks/blocks/patch_embedding.py:126-237) —
    pad-to-multiple + strided conv projection + optional norm.

TPU-first: everything is channel-last; the rel-pos index is a static numpy
precompute that constant-folds; rolls/partitions are reshape/transpose ops
XLA fuses. Gradient checkpointing maps to `jax.checkpoint` (remat) applied
at the model level.
"""

from __future__ import annotations

import itertools
from functools import reduce
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.init import trunc_normal
from ..ops.rel_bias import rel_bias_gather
from ..ops.rel_bias import rel_pos_index as _rel_pos_index
from ..ops.window import get_window_size, window_partition, window_reverse
from .factories import get_act
from .norms import make_norm
from .transformer import MLPBlock

NormSpec = tuple[str, dict[str, Any]] | str


# the static [N, N] rel-pos table index now lives in ops/rel_bias.py
# alongside the scatter-free-VJP gather (imported above; the
# `_rel_pos_index` alias keeps the golden index test's import path)


class DropPath(nn.Module):
    """Per-sample stochastic depth (drops the whole residual branch)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        return nn.Dropout(rate=self.rate,
                          broadcast_dims=tuple(range(1, x.ndim)))(
                              x, deterministic=False)


class WindowAttention(nn.Module):
    """Windowed MHSA with relative position bias over `[B·nW, N, C]`."""

    num_heads: int
    window_size: tuple[int, ...]
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = False):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        table_len = reduce(lambda a, w: a * (2 * w - 1), self.window_size, 1)
        bias_table = self.param("relative_position_bias_table",
                                trunc_normal(0.02), (table_len, self.num_heads))
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        # Gather with heads MAJOR: a [N², H] gather lane-pads H (e.g. 3)
        # to the 128-wide tile — ~40× physical write traffic, measured
        # 17 GB/s (scripts/gap_accounting.py, round 3).  [H, N²] keeps the
        # long axis lane-minor and streams at full bandwidth.
        from ..ops.dispatch import _flag
        if not _flag("MISEG_SCATTER_BIAS_GRAD"):
            # separable scatter-free VJP (ops/rel_bias.py) — the plain
            # take's backward is a ~2 ms serial scatter per table on v5e
            # (gap_accounting --train, rounds 4/5).  The clipped-window
            # case (reference's [:n,:n] prefix quirk, n < ∏window) is NOT
            # a sub-grid, but the clipped index is exactly the FULL
            # index's leading block — so gather the full-window bias and
            # slice: the slice's backward zero-pads the cotangent and the
            # separable VJP handles the rest (round 5: stage-4 6³<7³
            # windows at 96³ were the last serial-scatter rows in the
            # train accounting, fusion.2441 2 MB @ ~1 GB/s).
            rel_bias = rel_bias_gather(bias_table.T,
                                       tuple(self.window_size))  # [H, N, N]
            if n != rel_bias.shape[-1]:
                rel_bias = rel_bias[:, :n, :n]
        else:
            index = _rel_pos_index(self.window_size)[:n, :n].reshape(-1)
            rel_bias = jnp.take(bias_table.T, jnp.asarray(index),
                                axis=1).reshape(-1, n, n)  # [H, N, N]

        # `mask` is region ids `i32 [nW, N]` (window_region_ids) or a legacy
        # additive `[nW, N, N]` tensor; ids keep the shifted-window mask out
        # of HBM (stage 1's additive form is 343^3 f32 ≈ 161MB).
        from ..ops.dispatch import pallas_attn_min_bw, use_pallas_attn
        min_bw = pallas_attn_min_bw()
        want = (use_pallas_attn() if min_bw is None else b >= min_bw)
        fuse = want and not (train and self.attn_drop > 0) \
            and (mask is None or mask.ndim == 2)
        if fuse:
            from ..ops.pallas import fused_window_attention
            qkv = qkv.reshape(b, n, 3, c)
            out = fused_window_attention(
                qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                rel_bias.astype(jnp.float32), mask,
                num_heads=self.num_heads)
        else:
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            # The materialized score tensor between the QKᵀ fusion and the
            # softmax fusion is the largest forward tensor (stage 1:
            # [343,3,343,343] ≈ 546 MB f32/window).  MISEG_BF16_SCORES=1
            # rounds it to bf16 — accumulation stays f32 on the MXU, the
            # bias/mask adds below run f32 inside the producer fusion, and
            # only the tensor written to HBM (the cast right before the
            # softmax, the producer-fusion root) is rounded.
            from ..ops.dispatch import use_bf16_scores
            score_dtype = (jnp.bfloat16
                           if q.dtype == jnp.bfloat16 and use_bf16_scores()
                           else jnp.float32)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32) \
                * (head_dim ** -0.5)
            attn = attn + rel_bias.astype(attn.dtype)[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(b // nw, nw, self.num_heads, n, n)
                if mask.ndim == 2:
                    # XLA fuses the broadcast compare into the softmax
                    # fusion — the [nW, N, N] tensor never hits HBM
                    from ..ops.window import ATTN_MASK_VALUE
                    neq = mask[:, None, :] != mask[:, :, None]
                    attn = jnp.where(neq[None, :, None],
                                     attn + jnp.asarray(ATTN_MASK_VALUE,
                                                        attn.dtype), attn)
                else:
                    attn = attn + mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(b, self.num_heads, n, n)
            # round ONLY the HBM-materialized scores (no-op when f32);
            # softmax internals stay f32 regardless — its intermediates
            # live inside one fusion and never hit HBM, so the only other
            # written tensor is the bf16 `.astype(v.dtype)` output below
            attn = jax.nn.softmax(attn.astype(score_dtype).astype(jnp.float32),
                                  axis=-1)
            attn = nn.Dropout(rate=self.attn_drop)(attn, deterministic=not train)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v).reshape(b, n, c)
        out = nn.Dense(c, name="proj")(out)
        return nn.Dropout(rate=self.proj_drop)(out, deterministic=not train)


class SwinTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: tuple[int, ...]
    shift_size: tuple[int, ...]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    act: str | tuple = "gelu"
    norm: NormSpec = ("layer", {})

    def _pad_roll_attend(self, x, mask_matrix, modalities, train):
        x = make_norm(self.norm, self.dim, name="norm1")(x, modalities, train=train)
        spatial = x.shape[1:-1]
        window_size, shift_size = get_window_size(spatial, self.window_size,
                                                  self.shift_size)
        pads = [(0, 0)] + [(0, (w - s % w) % w) for s, w in zip(spatial, window_size)] + [(0, 0)]
        x = jnp.pad(x, pads)
        padded = x.shape[1:-1]

        shifted = any(shift_size)
        if shifted:
            x = jnp.roll(x, [-s for s in shift_size], axis=tuple(range(1, x.ndim - 1)))
            attn_mask = mask_matrix
        else:
            attn_mask = None
        windows = window_partition(x, window_size)
        # the attention is built with the CONFIGURED window size, not the
        # runtime-clipped one: the reference sizes the bias table for the
        # full window always and indexes rel_pos_index[:n, :n] when the
        # resolution clips the window (window_attention.py:105-107) — the
        # first-n-positions subset quirk, reproduced here so bottleneck
        # stages (e.g. 6³ windows at 96³ input) match numerically and
        # checkpoints are shape-compatible.
        attn_windows = WindowAttention(
            num_heads=self.num_heads, window_size=tuple(self.window_size),
            qkv_bias=self.qkv_bias, attn_drop=self.attn_drop,
            proj_drop=self.drop, name="attn")(windows, attn_mask, train=train)
        x = window_reverse(attn_windows, window_size, (x.shape[0], *padded))
        if shifted:
            x = jnp.roll(x, list(shift_size), axis=tuple(range(1, x.ndim - 1)))
        crop = tuple(slice(0, s) for s in spatial)
        return x[(slice(None), *crop, slice(None))]

    @nn.compact
    def __call__(self, x, mask_matrix=None, modalities=None, train: bool = False):
        # `train` is positional-or-keyword so `nn.remat(..., static_argnums=(4,))`
        # can mark it static when gradient checkpointing is on.
        shortcut = x
        x = self._pad_roll_attend(x, mask_matrix, modalities, train)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, train=train)
        y = make_norm(self.norm, self.dim, name="norm2")(x, modalities, train=train)
        y = MLPBlock(mlp_dim=int(self.dim * self.mlp_ratio), dropout_rate=self.drop,
                     act=self.act, name="mlp")(y, train=train)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train=train)


class PatchMergingV2(nn.Module):
    """2^nd space-to-channel concat → norm → Linear(→2·dim, no bias)."""

    dim: int
    norm: NormSpec = ("instance_cond", {})
    legacy: bool = False  # reproduce MONAI v0.9 slice order (dup x5/x6 bug)

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        nd = x.ndim - 2
        spatial = x.shape[1:-1]
        pads = [(0, 0)] + [(0, s % 2) for s in spatial] + [(0, 0)]
        if any(s % 2 for s in spatial):
            x = jnp.pad(x, pads)
        if nd == 3:
            if self.legacy:
                # MONAI v0.9 ordering incl. duplicated slices (patch_merging.py:120-128)
                offsets = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                           (1, 0, 1), (0, 1, 0), (0, 0, 1), (1, 1, 1)]
            else:
                offsets = list(itertools.product((0, 1), repeat=3))
            x = jnp.concatenate(
                [x[:, i::2, j::2, k::2, :] for i, j, k in offsets], axis=-1)
        else:
            # 2D: reference iterates product as (i, j) but slices [j::2, i::2]
            x = jnp.concatenate(
                [x[:, j::2, i::2, :] for i, j in itertools.product((0, 1), repeat=2)],
                axis=-1)
        merged = x.shape[-1]
        x = make_norm(self.norm, merged, name="norm")(x, modalities, train=train)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


def PatchMerging(dim, norm=("instance_cond", {}), name=None):
    """Legacy (v0.9-compat) patch merging — see PatchMergingV2.legacy."""
    return PatchMergingV2(dim=dim, norm=norm, legacy=True, name=name)


class PatchEmbed(nn.Module):
    """Swin patch embedding: pad-to-multiple + strided conv (+ optional norm)."""

    patch_size: tuple[int, ...]
    embed_dim: int = 48
    norm: NormSpec | None = None

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        spatial = x.shape[1:-1]
        pads = [(0, 0)] + [(0, (p - s % p) % p) for s, p in zip(spatial, self.patch_size)] + [(0, 0)]
        if any(p[1] for p in pads[1:-1]):
            x = jnp.pad(x, pads)
        x = nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                    strides=self.patch_size, padding="VALID", name="proj")(x)
        if self.norm is not None:
            x = make_norm(self.norm, self.embed_dim, name="norm")(x, modalities, train=train)
        return x
