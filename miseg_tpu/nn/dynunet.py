"""DynUNet-style blocks: UnetResBlock / UnetBasicBlock / UnetUpBlock / UnetOutBlock.

Reference parity (networks/blocks/dynunet_block.py):
  * `UnetResBlock` (:25-126): conv(k,s,no-bias) → norm → lrelu → conv(k,1) →
    norm (+ 1x1-strided conv3 → norm3 residual when downsampling) → add → lrelu;
  * `UnetBasicBlock` (:129-203): conv → norm → lrelu ×2;
  * `UnetUpBlock` (:206-270): transp-conv(k=s=upsample) → concat skip →
    UnetBasicBlock;
  * `UnetOutBlock` (:273-292): 1x1 conv with bias.

Norms dispatch `modalities` when conditional; convs are bias-free as in the
reference's `get_conv_layer(bias=False)` default (:295-318).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .convolutions import Convolution, get_output_padding, get_padding
from .factories import get_act, leaky_slope
from .norms import make_norm

NormSpec = tuple[str, dict[str, Any]] | str
_LRELU = ("leakyrelu", {"negative_slope": 0.01})


def _conv(out_channels, kernel_size, stride, *, transposed=False, bias=False, name=None):
    """dynunet conv: explicit padding rule, no ADN (dynunet_block.py:295-318)."""
    pad = get_padding(kernel_size, stride)
    out_pad = get_output_padding(kernel_size, stride, pad) if transposed else None
    return Convolution(out_channels=out_channels, kernel_size=kernel_size,
                       strides=stride, act=None, norm=None, dropout=None,
                       use_bias=bias, conv_only=True, is_transposed=transposed,
                       padding=pad, output_padding=out_pad, name=name)


class UnetResBlock(nn.Module):
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    norm: NormSpec = ("instance", {})
    act: str | tuple = _LRELU
    dropout: float | None = None

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        # leaky-relu tails fuse into the norm kernels (norm1+act;
        # norm2+residual-add+act — one HBM pass each on the Pallas path)
        slope = leaky_slope(self.act)
        act = get_act(self.act) if slope is None else None
        in_channels = x.shape[-1]
        s = self.stride if isinstance(self.stride, (list, tuple)) else (self.stride,) * (x.ndim - 2)
        downsample = in_channels != self.out_channels or any(si != 1 for si in s)

        out = _conv(self.out_channels, self.kernel_size, self.stride, name="conv1")(x)
        out = make_norm(self.norm, self.out_channels, name="norm1")(
            out, modalities, train=train, act_slope=slope)
        if act is not None:
            out = act(out)
        if self.dropout:
            out = nn.Dropout(rate=float(self.dropout))(out, deterministic=not train)
        out = _conv(self.out_channels, self.kernel_size, 1, name="conv2")(out)

        residual = x
        if downsample:
            residual = _conv(self.out_channels, 1, self.stride, name="conv3")(residual)
            residual = make_norm(self.norm, self.out_channels, name="norm3")(
                residual, modalities, train=train)
        if act is None:
            return make_norm(self.norm, self.out_channels, name="norm2")(
                out, modalities, train=train, act_slope=slope, add=residual)
        out = make_norm(self.norm, self.out_channels, name="norm2")(
            out, modalities, train=train)
        return act(out + residual)


class UnetBasicBlock(nn.Module):
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    norm: NormSpec = ("instance", {})
    act: str | tuple = _LRELU
    dropout: float | None = None

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        slope = leaky_slope(self.act)
        act = get_act(self.act) if slope is None else None
        out = _conv(self.out_channels, self.kernel_size, self.stride, name="conv1")(x)
        out = make_norm(self.norm, self.out_channels, name="norm1")(
            out, modalities, train=train, act_slope=slope)
        if act is not None:
            out = act(out)
        if self.dropout:
            out = nn.Dropout(rate=float(self.dropout))(out, deterministic=not train)
        out = _conv(self.out_channels, self.kernel_size, 1, name="conv2")(out)
        out = make_norm(self.norm, self.out_channels, name="norm2")(
            out, modalities, train=train, act_slope=slope)
        return act(out) if act is not None else out


class UnetUpBlock(nn.Module):
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    upsample_kernel_size: int | Sequence[int] = 2
    norm: NormSpec = ("instance", {})
    act: str | tuple = _LRELU
    dropout: float | None = None
    trans_bias: bool = False
    res_block: bool = False

    @nn.compact
    def __call__(self, x, skip, modalities=None, *, train: bool = False):
        up = _conv(self.out_channels, self.upsample_kernel_size,
                   self.upsample_kernel_size, transposed=True,
                   bias=self.trans_bias, name="transp_conv")(x)
        out = jnp.concatenate([up, skip], axis=-1)
        block = UnetResBlock if self.res_block else UnetBasicBlock
        return block(out_channels=self.out_channels, kernel_size=self.kernel_size,
                     stride=1, norm=self.norm, act=self.act, dropout=self.dropout,
                     name="conv_block")(out, modalities, train=train)


class UnetOutBlock(nn.Module):
    out_channels: int
    dropout: float | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.dropout:
            x = nn.Dropout(rate=float(self.dropout))(x, deterministic=not train)
        return _conv(self.out_channels, 1, 1, bias=True, name="conv")(x)
