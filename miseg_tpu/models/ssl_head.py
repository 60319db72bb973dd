"""Self-supervised pretraining head over the Swin-ViT backbone.

Reference parity: `SSLHead` (networks/nets/ssl_head.py:19-91) — SwinViT
(layer norms) bottom features feed (a) a rotation head (Linear dim→4 on
token 0), (b) a contrastive head (Linear dim→512 on token 1), and (c) a
reconstruction decoder: "vae" (conv+IN+lrelu+2× trilinear upsample ×5 →
1x1 conv), "deconv" (5× stride-2 transposed conv), or
"large_kernel_deconv" (one 32³ transposed conv).  Dormant in the reference
(not wired to an entry point) but part of the capability surface — it
documents the provenance of the MONAI `model_swinvit.pt` weights.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.convolutions import Convolution
from ..ops.norms import instance_norm
from .swin_transformer import SwinTransformer


def _trilinear_upsample(x, factor: int = 2):
    spatial = tuple(s * factor for s in x.shape[1:-1])
    return jax.image.resize(x, (x.shape[0], *spatial, x.shape[-1]), method="linear")


class SSLHead(nn.Module):
    in_channels: int = 1
    feature_size: int = 48
    dropout_path_rate: float = 0.0
    use_checkpoint: bool = False
    spatial_dims: int = 3
    upsample: str = "vae"
    dim: int = 768

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        nd = self.spatial_dims
        hidden = SwinTransformer(
            in_chans=self.in_channels, embed_dim=self.feature_size,
            window_size=(7,) * nd, patch_size=(2,) * nd,
            depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24), mlp_ratio=4.0,
            qkv_bias=True, drop_path_rate=self.dropout_path_rate,
            use_checkpoint=self.use_checkpoint, norm=("layer", {}),
            name="swinViT")(x, True, None, train=train)
        x_out = hidden[4]  # [B, *spatial/32, dim] channel-last
        b = x_out.shape[0]
        dim = x_out.shape[-1]
        tokens = x_out.reshape(b, -1, dim)

        x_rot = nn.Dense(4, name="rotation_head")(tokens[:, 0])
        x_contrastive = nn.Dense(512, name="contrastive_head")(tokens[:, 1])

        h = x_out
        if self.upsample == "large_kernel_deconv":
            h = Convolution(out_channels=self.in_channels, kernel_size=32,
                            strides=32, is_transposed=True, conv_only=True,
                            padding=0, output_padding=0, name="conv")(h)
        elif self.upsample == "deconv":
            for i, ch in enumerate([dim // 2, dim // 4, dim // 8, dim // 16,
                                    self.in_channels]):
                h = Convolution(out_channels=ch, kernel_size=2, strides=2,
                                is_transposed=True, conv_only=True, padding=0,
                                output_padding=0, name=f"conv_{i}")(h)
        elif self.upsample == "vae":
            for i, ch in enumerate([dim // 2, dim // 4, dim // 8, dim // 16,
                                    dim // 16]):
                h = Convolution(out_channels=ch, kernel_size=3, strides=1,
                                conv_only=True, name=f"conv_{i}")(h)
                h = instance_norm(h)
                h = jax.nn.leaky_relu(h, negative_slope=0.01)
                h = _trilinear_upsample(h, 2)
            h = Convolution(out_channels=self.in_channels, kernel_size=1,
                            strides=1, conv_only=True, name="conv_out")(h)
        else:
            raise ValueError(f"unknown upsample mode {self.upsample!r}")
        return x_rot, x_contrastive, h
