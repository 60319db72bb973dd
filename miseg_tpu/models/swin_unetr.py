"""Swin-UNETR: hierarchical swin backbone + UNETR-style conv decoder.

Reference parity: `SwinUNETR` (networks/nets/swin_unetr.py:36-366) —
SwinTransformer (patch 2, window 7) feature pyramid, 5 `UnetrBasicBlock`
encoders (input + pyramid levels 0..2 and 4), 5 `UnetrUpBlock` decoder
stages, 1x1x1 out head.  Config surface (`from_config`) mirrors
`from_argparse_args` (swin_unetr.py:260-301): `num_heads = (h,2h,4h,8h)`
from a scalar, 4-stage depths from a scalar or 4-list, `feature_size % 12
== 0` enforced, layer norm rejected for encoder/decoder (:131-133).
"C-Swin-UNETR" = this model with `instance_cond` encoder+vit norms.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import numpy as np

from ..nn.dynunet import UnetOutBlock
from ..nn.unetr_blocks import UnetrBasicBlock, UnetrUpBlock
from .swin_transformer import SwinTransformer

NormSpec = tuple[str, dict[str, Any]] | str


def _kind(norm: NormSpec) -> str:
    return norm if isinstance(norm, str) else norm[0]


class SwinUNETR(nn.Module):
    img_size: Sequence[int]
    in_channels: int
    out_channels: int
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    feature_size: int = 24
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    dropout_path_rate: float = 0.0
    normalize: bool = True
    use_checkpoint: bool = False
    downsample: str = "merging"
    vit_norm: NormSpec = ("layer", {})
    decoder_norm: NormSpec = ("instance", {})
    encoder_norm: NormSpec = ("instance", {})

    ENCODER_PREFIXES = ("swinViT", "encoder1", "encoder2", "encoder3",
                        "encoder4", "encoder10")

    def _validate(self):
        nd = len(self.img_size)
        if nd not in (2, 3):
            raise ValueError("spatial dimension should be 2 or 3.")
        for m in self.img_size:
            for i in range(5):
                if m % np.power(2, i + 1) != 0:
                    raise ValueError("input image size (img_size) should be divisible "
                                     "by stage-wise image resolution.")
        if not 0 <= self.drop_rate <= 1:
            raise ValueError("dropout rate should be between 0 and 1.")
        if not 0 <= self.attn_drop_rate <= 1:
            raise ValueError("attention dropout rate should be between 0 and 1.")
        if not 0 <= self.dropout_path_rate <= 1:
            raise ValueError("drop path rate should be between 0 and 1.")
        if self.feature_size % 12 != 0:
            raise ValueError("feature_size should be divisible by 12.")
        if _kind(self.decoder_norm) == "layer" or _kind(self.encoder_norm) == "layer":
            raise ValueError("Layer normalization not supported for encoder and "
                             "decoder blocks, please select another normalization.")

    @nn.compact
    def __call__(self, x_in, modalities=None, *, train: bool = False):
        self._validate()
        nd = len(self.img_size)
        fs = self.feature_size

        hidden = SwinTransformer(
            in_chans=self.in_channels, embed_dim=fs,
            window_size=(7,) * nd, patch_size=(2,) * nd,
            depths=tuple(self.depths), num_heads=tuple(self.num_heads),
            mlp_ratio=4.0, qkv_bias=True, drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.dropout_path_rate,
            use_checkpoint=self.use_checkpoint, downsample=self.downsample,
            norm=self.vit_norm, name="swinViT")(
                x_in, self.normalize, modalities, train=train)

        # use_checkpoint remats the 96³ conv blocks too — they, not the swin
        # blocks, dominate training HBM (batch-2 OOMs by 6GB without this)
        basic_cls = (nn.remat(UnetrBasicBlock, static_argnums=(3,))
                     if self.use_checkpoint else UnetrBasicBlock)
        up_cls = (nn.remat(UnetrUpBlock, static_argnums=(4,))
                  if self.use_checkpoint else UnetrUpBlock)

        def enc(out_ch, name, x):
            return basic_cls(out_channels=out_ch, kernel_size=3, stride=1,
                             norm=self.encoder_norm, res_block=True,
                             name=name)(x, modalities, train)

        enc0 = enc(fs, "encoder1", x_in)
        enc1 = enc(fs, "encoder2", hidden[0])
        enc2 = enc(2 * fs, "encoder3", hidden[1])
        enc3 = enc(4 * fs, "encoder4", hidden[2])
        dec4 = enc(16 * fs, "encoder10", hidden[4])

        def dec(out_ch, name, x, skip):
            return up_cls(out_channels=out_ch, kernel_size=3,
                          upsample_kernel_size=2, norm=self.decoder_norm,
                          res_block=True, name=name)(x, skip, modalities,
                                                     train)

        dec3 = dec(8 * fs, "decoder5", dec4, hidden[3])
        dec2 = dec(4 * fs, "decoder4", dec3, enc3)
        dec1 = dec(2 * fs, "decoder3", dec2, enc2)
        dec0 = dec(fs, "decoder2", dec1, enc1)
        out = dec(fs, "decoder1", dec0, enc0)
        return UnetOutBlock(out_channels=self.out_channels, name="out")(out, train=train)
