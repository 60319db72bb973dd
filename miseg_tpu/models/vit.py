"""Vision Transformer backbone with per-modality conditional norms.

Reference parity: `ViT` (networks/nets/vit.py:31-197) —
patch-embed → `num_layers`× TransformerBlock (hidden states collected after
every block) → final norm → `(x, hidden_states_out)`; optional
classification head with `GradientReversal` (the dormant adversarial hook,
vit.py:132-165).

Norm semantics: with `norm="layer"` the final norm acts over the channel
axis; any other norm is applied treating the token axis L as "spatial"
(the reference rearranges `n l c -> n c l` to reuse 1d norms,
vit.py:183-193 — channel-last tensors here make that a no-op).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import GradientReversal
from ..nn.norms import make_norm
from ..nn.patch_embedding import PatchEmbeddingBlock
from ..nn.transformer import TransformerBlock

NormSpec = tuple[str, dict[str, Any]] | str


class ViT(nn.Module):
    in_channels: int
    img_size: Sequence[int]
    patch_size: Sequence[int]
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    pos_embed: str = "conv"
    classification: bool = False
    num_classes: int = 2
    dropout_rate: float = 0.0
    post_activation: str = "Tanh"
    qkv_bias: bool = False
    norm: NormSpec = ("layer", {})
    classification_reverse_gradient: bool = False
    alpha_reversal: float = 1.0

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        if not 0 <= self.dropout_rate <= 1:
            raise ValueError("dropout_rate should be between 0 and 1.")
        if self.hidden_size % self.num_heads:
            raise ValueError("hidden_size should be divisible by num_heads.")
        kind = self.norm if isinstance(self.norm, str) else self.norm[0]
        if kind == "instance_cond" and modalities is None:
            raise ValueError("Modalities must be passed to the forward step when "
                             "norm is 'instance_cond'.")

        x = PatchEmbeddingBlock(
            img_size=tuple(self.img_size), patch_size=tuple(self.patch_size),
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            pos_embed=self.pos_embed, dropout_rate=self.dropout_rate,
            name="patch_embedding")(x, train=train)

        if self.classification:
            cls_token = self.param("cls_token", nn.initializers.zeros,
                                   (1, 1, self.hidden_size))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_token, (x.shape[0], 1, self.hidden_size)).astype(x.dtype), x],
                axis=1)

        hidden_states_out = []
        for i in range(self.num_layers):
            x = TransformerBlock(
                hidden_size=self.hidden_size, mlp_dim=self.mlp_dim,
                num_heads=self.num_heads, dropout_rate=self.dropout_rate,
                qkv_bias=self.qkv_bias, norm=self.norm,
                name=f"blocks_{i}")(x, modalities, train=train)
            hidden_states_out.append(x)

        # Final norm: "layer" acts over C; others treat L as spatial
        # (channel-last already matches the reference's n c l rearrange).
        x = make_norm(self.norm, self.hidden_size, name="norm")(x, modalities, train=train)

        if self.classification:
            h = x[:, 0]
            if self.classification_reverse_gradient:
                h = GradientReversal(alpha=self.alpha_reversal)(h)
            h = nn.Dense(self.num_classes, name="classification_head")(h)
            if self.post_activation == "Tanh":
                h = jnp.tanh(h)
            elif self.post_activation == "Softmax":
                h = nn.softmax(h, axis=1)
            return h, hidden_states_out
        return x, hidden_states_out
