"""UNETR encoder/decoder blocks.

Reference parity (networks/blocks/unetr_block.py):
  * `UnetrBasicBlock` (:216-266) — UnetResBlock or UnetBasicBlock;
  * `UnetrUpBlock` (:21-85) — transp-conv ×2 upsample → concat skip →
    conv block;
  * `UnetrPrUpBlock` (:88-213) — initial transp-conv then `num_layer`×
    (transp-conv [→ conv block]) progressive upsampling projection.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .dynunet import UnetBasicBlock, UnetResBlock, _conv

NormSpec = tuple[str, dict[str, Any]] | str


class UnetrBasicBlock(nn.Module):
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    norm: NormSpec = ("instance", {})
    res_block: bool = False

    @nn.compact
    def __call__(self, x, modalities=None, train: bool = False):
        # `train` positional-or-keyword: nn.remat(..., static_argnums=(3,))
        block = UnetResBlock if self.res_block else UnetBasicBlock
        return block(out_channels=self.out_channels, kernel_size=self.kernel_size,
                     stride=self.stride, norm=self.norm, name="layer")(
                         x, modalities, train=train)


class UnetrUpBlock(nn.Module):
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    upsample_kernel_size: int | Sequence[int] = 2
    norm: NormSpec = ("instance", {})
    res_block: bool = False

    @nn.compact
    def __call__(self, x, skip, modalities=None, train: bool = False):
        # `train` positional-or-keyword: nn.remat(..., static_argnums=(4,))
        up = _conv(self.out_channels, self.upsample_kernel_size,
                   self.upsample_kernel_size, transposed=True, name="transp_conv")(x)
        out = jnp.concatenate([up, skip], axis=-1)
        block = UnetResBlock if self.res_block else UnetBasicBlock
        return block(out_channels=self.out_channels, kernel_size=self.kernel_size,
                     stride=1, norm=self.norm, name="conv_block")(
                         out, modalities, train=train)


class UnetrPrUpBlock(nn.Module):
    out_channels: int
    num_layer: int = 2
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    upsample_kernel_size: int | Sequence[int] = 2
    norm: NormSpec = ("instance", {})
    conv_block: bool = False
    res_block: bool = False

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        x = _conv(self.out_channels, self.upsample_kernel_size,
                  self.upsample_kernel_size, transposed=True,
                  name="transp_conv_init")(x)
        for i in range(self.num_layer):
            x = _conv(self.out_channels, self.upsample_kernel_size,
                      self.upsample_kernel_size, transposed=True,
                      name=f"up{i}")(x)
            if self.conv_block:
                block = UnetResBlock if self.res_block else UnetBasicBlock
                x = block(out_channels=self.out_channels,
                          kernel_size=self.kernel_size, stride=self.stride,
                          norm=self.norm, name=f"block{i}")(x, modalities, train=train)
        return x
