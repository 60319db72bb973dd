"""Model factory: `Config` → flax module.

Reference parity: `model_from_argparse_args` (networks/utils/utils.py:17-64)
— name→model dispatch for unetr / unet / unet_vanilla / swin_unetr /
pre_swin_unetr, with `parse_normalization` applied to the three norm-name
flags per model.  Pretrained-weight ingest (`model_swinvit.pt` remap,
partial fine-tune load skipping mismatched output heads) lives in
`miseg_tpu.train.pretrained` since in JAX it operates on param pytrees,
not modules.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..config import Config, _scalar_or_list
from ..ops.norms import parse_normalization
from .swin_unetr import SwinUNETR
from .unet import UNet, UNetVanilla
from .unetr import UNETR

MODEL_NAMES = ("unetr", "unet", "unet_vanilla", "swin_unetr", "pre_swin_unetr")


def _norm_specs(cfg: Config):
    vit = parse_normalization(cfg.vit_norm_name, affine=not cfg.vit_norm_no_affine,
                              num_groups=cfg.num_groups, num_styles=cfg.num_styles)
    enc = parse_normalization(cfg.encoder_norm_name,
                              affine=not cfg.encoder_norm_no_affine,
                              num_groups=cfg.num_groups, num_styles=cfg.num_styles)
    dec = parse_normalization(cfg.decoder_norm_name,
                              affine=not cfg.decoder_norm_no_affine,
                              num_groups=cfg.num_groups, num_styles=cfg.num_styles)
    return vit, enc, dec


def model_from_config(cfg: Config) -> nn.Module:
    vit_norm, encoder_norm, decoder_norm = _norm_specs(cfg)
    name = cfg.model_name
    if name == "unetr":
        return UNETR(
            in_channels=cfg.in_channels, out_channels=cfg.out_channels,
            img_size=cfg.roi, feature_size=cfg.feature_size_scalar,
            hidden_size=cfg.hidden_size, mlp_dim=cfg.mlp_dim,
            num_heads=cfg.num_heads, pos_embed=cfg.pos_embed,
            conv_block=not cfg.no_conv_block, res_block=not cfg.no_res_block,
            dropout_rate=cfg.dropout_rate, qkv_bias=cfg.qkv_bias,
            use_checkpoint=cfg.use_checkpoint,
            vit_norm=vit_norm, decoder_norm=decoder_norm,
            encoder_norm=encoder_norm)
    if name == "unet":
        # channel progression starts at 2*feature_size — reference TODO at
        # networks/nets/unet.py:218-219, replicated for checkpoint parity.
        channels = [cfg.feature_size_scalar * 2 ** i
                    for i in range(1, cfg.num_layers + 1)]
        return UNet(
            in_channels=cfg.in_channels, out_channels=cfg.out_channels,
            channels=channels, strides=list(cfg.strides),
            kernel_size=_scalar_or_list(cfg.kernel_size),
            up_kernel_size=_scalar_or_list(cfg.up_kernel_size),
            num_res_units=cfg.num_res_units, act=cfg.activation,
            norm_down=encoder_norm, norm_up=decoder_norm,
            dropout=cfg.dropout_rate, bias=not cfg.no_bias,
            adn_ordering=cfg.adn_ordering)
    if name == "unet_vanilla":
        return UNetVanilla(
            in_channels=cfg.in_channels, out_channels=cfg.out_channels,
            channels=list(cfg.feature_size), strides=list(cfg.strides),
            kernel_size=_scalar_or_list(cfg.kernel_size),
            up_kernel_size=_scalar_or_list(cfg.up_kernel_size),
            num_res_units=cfg.num_res_units, act=cfg.activation,
            norm_down=encoder_norm, norm_up=decoder_norm,
            dropout=cfg.dropout_rate, bias=not cfg.no_bias,
            adn_ordering=cfg.adn_ordering)
    if name in ("swin_unetr", "pre_swin_unetr"):
        if len(cfg.depth_swin_block) == 1:
            depths = (cfg.depth_swin_block[0],) * 4
        elif len(cfg.depth_swin_block) == 4:
            depths = tuple(cfg.depth_swin_block)
        else:
            raise ValueError("The length of depth_swin_block should be 4")
        num_heads = tuple(2 ** i * cfg.num_heads for i in range(4))
        return SwinUNETR(
            img_size=cfg.roi, in_channels=cfg.in_channels,
            out_channels=cfg.out_channels, depths=depths, num_heads=num_heads,
            feature_size=cfg.feature_size_scalar, drop_rate=cfg.dropout_rate,
            attn_drop_rate=cfg.attn_drop_rate,
            dropout_path_rate=cfg.dropout_path_rate,
            normalize=not cfg.no_normalize_swin,
            use_checkpoint=cfg.use_checkpoint, downsample=cfg.downsample,
            vit_norm=vit_norm, encoder_norm=encoder_norm,
            decoder_norm=decoder_norm)
    raise ValueError(f"Model {name} not implemented. Please chose another model.")
