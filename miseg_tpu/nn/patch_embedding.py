"""ViT patch embedding: conv or perceptron patchify + learned pos embedding.

Reference parity: `PatchEmbeddingBlock`
(networks/blocks/patch_embedding.py:32-125) — conv (strided conv then
flatten) or perceptron (space-to-patch rearrange then Linear) patchify,
learned `[1, n_patches, hidden]` position embedding, trunc-normal init.
`pos_embed_type="sincos"` extends the surface with the fixed 1D
sine-cosine table MONAI's later PatchEmbeddingBlock offers (absent from
the pinned reference, kept for upstream-checkpoint compatibility).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.init import trunc_normal


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
            # fixed 1D sine-cosine table over the flattened patch index
            # (still a parameter for checkpoint-shape parity, init = table)
            def sincos_init(key, shape, dtype=jnp.float32):
                _, n, h = shape
                pos_i = np.arange(n)[:, None]
                div = np.exp(np.arange(0, h, 2) * (-math.log(10000.0) / h))
                tab = np.zeros((n, h), np.float32)
                tab[:, 0::2] = np.sin(pos_i * div)
                tab[:, 1::2] = np.cos(pos_i * div[:h // 2])
                return jnp.asarray(tab[None], dtype)

            pos = self.param("position_embeddings", sincos_init,
                             (1, n_patches, self.hidden_size))
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
