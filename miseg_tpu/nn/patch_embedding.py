"""ViT patch embedding: conv or perceptron patchify + learned pos embedding.

Reference parity: `PatchEmbeddingBlock`
(networks/blocks/patch_embedding.py:32-125) — conv (strided conv then
flatten) or perceptron (space-to-patch rearrange then Linear) patchify,
learned `[1, n_patches, hidden]` position embedding, trunc-normal init.
`pos_embed_type="sincos"` extends the surface with the fixed per-axis
sine-cosine table MONAI's later PatchEmbeddingBlock offers (absent from
the pinned reference, kept for upstream-checkpoint compatibility).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.init import trunc_normal


def build_sincos_position_embedding(grid_size: Sequence[int], embed_dim: int,
                                    temperature: float = 10000.0) -> np.ndarray:
    """MONAI `build_sincos_position_embedding` parity: per-axis sin/cos
    frequency tables over `embed_dim // (2·ndim)` frequencies, concatenated
    [sin(ax0), cos(ax0), sin(ax1), ...] along the channel dim; upstream
    registers the result with requires_grad=False (frozen)."""
    nd = len(grid_size)
    if embed_dim % (2 * nd):
        raise ValueError(
            f"embed_dim must be divisible by {2 * nd} for {nd}D sincos "
            f"position embedding, got {embed_dim}")
    pos_dim = embed_dim // (2 * nd)
    omega = 1.0 / (temperature ** (np.arange(pos_dim,
                                             dtype=np.float32) / pos_dim))
    grids = np.meshgrid(*[np.arange(g, dtype=np.float32) for g in grid_size],
                        indexing="ij")
    parts = []
    for g in grids:
        out = g.reshape(-1)[:, None] * omega[None]
        parts += [np.sin(out), np.cos(out)]
    return np.concatenate(parts, axis=1)[None].astype(np.float32)


class PatchEmbeddingBlock(nn.Module):
    img_size: tuple[int, ...]
    patch_size: tuple[int, ...]
    hidden_size: int
    num_heads: int
    pos_embed: str = "conv"  # "conv" | "perceptron"
    pos_embed_type: str = "learnable"  # "learnable" | "sincos" | "none"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if not 0 <= self.dropout_rate <= 1:
            raise ValueError("dropout_rate should be between 0 and 1.")
        if self.hidden_size % self.num_heads:
            raise ValueError("hidden size should be divisible by num_heads.")
        for m, p in zip(self.img_size, self.patch_size):
            if m < p:
                raise ValueError("patch_size should be smaller than img_size.")
            if self.pos_embed == "perceptron" and m % p:
                raise ValueError("img_size should be divisible by patch_size for perceptron.")
        n_patches = int(np.prod([m // p for m, p in zip(self.img_size, self.patch_size)]))

        if self.pos_embed == "conv":
            x = nn.Conv(self.hidden_size, kernel_size=self.patch_size,
                        strides=self.patch_size, padding="VALID",
                        name="patch_embeddings")(x)
            x = x.reshape(x.shape[0], -1, self.hidden_size)
        elif self.pos_embed == "perceptron":
            b = x.shape[0]
            spatial = x.shape[1:-1]
            c = x.shape[-1]
            nd = len(spatial)
            # [B, (g0 p0), (g1 p1), ..., C] -> [B, g0·g1·…, p0·p1·…·C]
            grid = [s // p for s, p in zip(spatial, self.patch_size)]
            shape = [b]
            for g, p in zip(grid, self.patch_size):
                shape += [g, p]
            x = x.reshape(*shape, c)
            perm = ([0] + [1 + 2 * i for i in range(nd)]
                    + [2 + 2 * i for i in range(nd)] + [2 * nd + 1])
            x = x.transpose(perm).reshape(b, int(np.prod(grid)), -1)
            x = nn.Dense(self.hidden_size, kernel_init=trunc_normal(0.02),
                         name="patch_embeddings")(x)
        else:
            raise ValueError(f"unsupported pos_embed {self.pos_embed!r}")

        if self.pos_embed_type == "sincos":
            # frozen table (MONAI registers it requires_grad=False) — a
            # plain constant, NOT a parameter: a trainable table would
            # drift during training and adamw decay would shrink even a
            # zero-grad one.  Deterministic, so torch checkpoints need no
            # import for it.
            grid = [m // p for m, p in zip(self.img_size, self.patch_size)]
            pos = jnp.asarray(
                build_sincos_position_embedding(grid, self.hidden_size))
        elif self.pos_embed_type == "learnable":
            pos = self.param("position_embeddings", trunc_normal(0.02),
                             (1, n_patches, self.hidden_size))
        elif self.pos_embed_type == "none":
            pos = None
        else:
            raise ValueError(f"unsupported pos_embed_type {self.pos_embed_type!r}")
        if pos is not None:
            x = x + pos.astype(x.dtype)
        return nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
