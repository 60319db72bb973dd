"""ViT-style transformer blocks: MLP, self-attention, pre-norm block.

Reference parity:
  * `TransformerBlock` (networks/blocks/transformer_block.py:24-109) —
    pre-norm residual block where non-layer norms normalize over the
    SEQUENCE dim (the reference rearranges `n l c -> n c l` to reuse 1d
    norms; channel-last here, instance norms already see L as spatial);
  * MONAI `MLPBlock`/`SABlock` (external surface, SURVEY.md §2.10).

Attention runs as einsum with f32 accumulation (MXU-friendly); sequence
lengths are static (216 tokens for 96³/16³ patches), so no masking/padding
is needed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .factories import get_act
from .norms import make_norm

NormSpec = tuple[str, dict[str, Any]] | str


class MLPBlock(nn.Module):
    mlp_dim: int
    dropout_rate: float = 0.0
    act: str | tuple = "gelu"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        hidden = x.shape[-1]
        x = nn.Dense(self.mlp_dim, name="linear1")(x)
        x = get_act(self.act)(x)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(hidden, name="linear2")(x)
        return nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)


class SABlock(nn.Module):
    """Multi-head self-attention over `[B, L, C]`."""

    num_heads: int
    dropout_rate: float = 0.0
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, l, c = x.shape
        if c % self.num_heads:
            raise ValueError("hidden size must be divisible by num_heads")
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, L, H, hd]
        attn = jnp.einsum("blhd,bmhd->bhlm", q, k,
                          preferred_element_type=jnp.float32) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(rate=self.dropout_rate)(attn, deterministic=not train)
        out = jnp.einsum("bhlm,bmhd->blhd", attn.astype(v.dtype), v)
        out = out.reshape(b, l, c)
        out = nn.Dense(c, name="proj")(out)
        return nn.Dropout(rate=self.dropout_rate)(out, deterministic=not train)


class TransformerBlock(nn.Module):
    hidden_size: int
    mlp_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    norm: NormSpec = ("layer", {})

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        if not 0 <= self.dropout_rate <= 1:
            raise ValueError("dropout_rate should be between 0 and 1.")
        n1 = make_norm(self.norm, self.hidden_size, name="norm1")
        n2 = make_norm(self.norm, self.hidden_size, name="norm2")
        x = x + SABlock(num_heads=self.num_heads, dropout_rate=self.dropout_rate,
                        qkv_bias=self.qkv_bias, name="attn")(
                            n1(x, modalities, train=train), train=train)
        x = x + MLPBlock(mlp_dim=self.mlp_dim, dropout_rate=self.dropout_rate,
                         name="mlp")(n2(x, modalities, train=train), train=train)
        return x
