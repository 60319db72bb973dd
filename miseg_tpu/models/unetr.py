"""UNETR: ViT encoder + convolutional UNet decoder.

Reference parity: `UNETR` (networks/nets/unetr.py:24-276) —
12-layer ViT (patch 16^nd), conv encoders off the input and hidden states
3/6/9, bottleneck from the final ViT output, four `UnetrUpBlock` decoder
stages, 1x1x1 `UnetOutBlock` head.  `proj_feat` (unetr.py:248-252) reshapes
the token sequence back to a volume — a plain reshape here because tensors
are channel-last.  The reference's layer-norm restriction for encoder /
decoder blocks (unetr.py:103-105) is replicated.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn

from ..nn.dynunet import UnetOutBlock
from ..nn.unetr_blocks import UnetrBasicBlock, UnetrPrUpBlock, UnetrUpBlock
from .vit import ViT

NormSpec = tuple[str, dict[str, Any]] | str


def _kind(norm: NormSpec) -> str:
    return norm if isinstance(norm, str) else norm[0]


class UNETR(nn.Module):
    in_channels: int
    out_channels: int
    img_size: Sequence[int]
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    # the reference pins this to 12 (unetr.py:90); exposed here because the
    # skip taps at hidden states 3/6/9 assume num_layers % 4 == 0
    num_layers: int = 12
    pos_embed: str = "conv"
    conv_block: bool = True
    res_block: bool = True
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    use_checkpoint: bool = False
    vit_norm: NormSpec = ("layer", {})
    decoder_norm: NormSpec = ("instance", {})
    encoder_norm: NormSpec = ("instance", {})

    # param subtrees frozen by `freeze_encoder` (training-engine mask)
    ENCODER_PREFIXES = ("vit", "encoder1", "encoder2", "encoder3", "encoder4")

    @nn.compact
    def __call__(self, x_in, modalities=None, *, train: bool = False):
        if _kind(self.decoder_norm) == "layer" or _kind(self.encoder_norm) == "layer":
            raise ValueError("Layer normalization not supported for encoder and "
                             "decoder blocks, please select another normalization.")
        if any(_kind(n) == "instance_cond" for n in
               (self.vit_norm, self.encoder_norm, self.decoder_norm)) and modalities is None:
            raise ValueError("Modalities must be passed to the forward step when a "
                             "norm is 'instance_cond'.")

        if self.num_layers % 4:
            raise ValueError("num_layers must be a multiple of 4 (skip taps at "
                             "hidden states L/4, L/2, 3L/4 — 3/6/9 for the "
                             "reference's fixed L=12, unetr.py:90,255-259).")
        nd = len(self.img_size)
        patch_size = (16,) * nd
        feat_size = tuple(s // p for s, p in zip(self.img_size, patch_size))

        def proj_feat(tokens):
            return tokens.reshape(tokens.shape[0], *feat_size, self.hidden_size)

        x, hidden = ViT(
            in_channels=self.in_channels, img_size=self.img_size,
            patch_size=patch_size, hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim, num_layers=self.num_layers,
            num_heads=self.num_heads,
            pos_embed=self.pos_embed, classification=False,
            dropout_rate=self.dropout_rate, qkv_bias=self.qkv_bias,
            norm=self.vit_norm, name="vit")(x_in, modalities, train=train)
        q = self.num_layers // 4

        fs = self.feature_size
        # use_checkpoint remats the full-resolution conv blocks (the HBM
        # hot spots at train time); `train` is passed positionally so
        # nn.remat can mark it static
        basic_cls = (nn.remat(UnetrBasicBlock, static_argnums=(3,))
                     if self.use_checkpoint else UnetrBasicBlock)
        up_cls = (nn.remat(UnetrUpBlock, static_argnums=(4,))
                  if self.use_checkpoint else UnetrUpBlock)
        enc1 = basic_cls(out_channels=fs, kernel_size=3, stride=1,
                         norm=self.encoder_norm, res_block=self.res_block,
                         name="encoder1")(x_in, modalities, train)
        enc2 = UnetrPrUpBlock(out_channels=fs * 2, num_layer=2, kernel_size=3,
                              stride=1, upsample_kernel_size=2,
                              norm=self.encoder_norm, conv_block=self.conv_block,
                              res_block=self.res_block, name="encoder2")(
                                  proj_feat(hidden[q]), modalities, train=train)
        enc3 = UnetrPrUpBlock(out_channels=fs * 4, num_layer=1, kernel_size=3,
                              stride=1, upsample_kernel_size=2,
                              norm=self.encoder_norm, conv_block=self.conv_block,
                              res_block=self.res_block, name="encoder3")(
                                  proj_feat(hidden[2 * q]), modalities, train=train)
        enc4 = UnetrPrUpBlock(out_channels=fs * 8, num_layer=0, kernel_size=3,
                              stride=1, upsample_kernel_size=2,
                              norm=self.encoder_norm, conv_block=self.conv_block,
                              res_block=self.res_block, name="encoder4")(
                                  proj_feat(hidden[3 * q]), modalities, train=train)

        dec4 = proj_feat(x)
        dec3 = up_cls(out_channels=fs * 8, kernel_size=3,
                            upsample_kernel_size=2, norm=self.decoder_norm,
                            res_block=self.res_block, name="decoder5")(
                                dec4, enc4, modalities, train)
        dec2 = up_cls(out_channels=fs * 4, kernel_size=3,
                            upsample_kernel_size=2, norm=self.decoder_norm,
                            res_block=self.res_block, name="decoder4")(
                                dec3, enc3, modalities, train)
        dec1 = up_cls(out_channels=fs * 2, kernel_size=3,
                            upsample_kernel_size=2, norm=self.decoder_norm,
                            res_block=self.res_block, name="decoder3")(
                                dec2, enc2, modalities, train)
        out = up_cls(out_channels=fs, kernel_size=3,
                           upsample_kernel_size=2, norm=self.decoder_norm,
                           res_block=self.res_block, name="decoder2")(
                               dec1, enc1, modalities, train)
        return UnetOutBlock(out_channels=self.out_channels, name="out")(out, train=train)
