"""Residual UNet (recursive) and UNetVanilla (explicit) models.

Reference parity:
  * `UNet` (networks/nets/unet.py:31-356) — recursive
    down → SkipConnection(subblock) → up construction; encoder layers use
    `norm_down`, decoder layers `norm_up`; down layers are `ResidualUnit`
    (or plain `Convolution` when num_res_units == 0); up layers are a
    transposed `Convolution` (+ ResidualUnit(subunits=1) when
    num_res_units > 0), top-level up is conv-only / last-conv-only.
    The `from_config` channel progression starts at `2*feature_size`
    (acknowledged TODO at unet.py:218-219 — replicated, since published
    checkpoints assumed it).
  * `UNetVanilla` (networks/nets/unet_vanilla.py:12-173) — explicit
    pre-conv → down path of ResidualUnit(subunits=2)×num_res_units →
    nearest-upsample + ResidualUnit up path → 1x1 out; `channels` is the
    full per-scale list (e.g. 16 64 128 256 512).
"""

from __future__ import annotations

import warnings
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.convolutions import Convolution, ResidualUnit
from ..nn.layers import SkipConnection

NormSpec = tuple[str, dict[str, Any]] | str


class _UNetLevel(nn.Module):
    """One recursion level: down → skip(subblock) → up (all modality-threaded)."""

    out_channels: int
    channels: tuple[int, ...]
    strides: tuple[int, ...]
    kernel_size: int | Sequence[int]
    up_kernel_size: int | Sequence[int]
    num_res_units: int
    act: str | tuple
    norm_down: NormSpec
    norm_up: NormSpec
    dropout: float
    bias: bool
    adn_ordering: str
    is_top: bool

    def _down(self, out_ch, strides, name):
        if self.num_res_units > 0:
            return ResidualUnit(out_channels=out_ch, strides=strides,
                                kernel_size=self.kernel_size,
                                subunits=self.num_res_units, act=self.act,
                                norm=self.norm_down, dropout=self.dropout or None,
                                use_bias=self.bias, adn_ordering=self.adn_ordering,
                                name=name)
        return Convolution(out_channels=out_ch, strides=strides,
                           kernel_size=self.kernel_size, act=self.act,
                           norm=self.norm_down, dropout=self.dropout or None,
                           use_bias=self.bias, adn_ordering=self.adn_ordering,
                           name=name)

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        c, s = self.channels[0], self.strides[0]
        x = self._down(c, s, "down")(x, modalities, train=train)

        if len(self.channels) > 2:
            sub = _UNetLevel(out_channels=c, channels=self.channels[1:],
                             strides=self.strides[1:], kernel_size=self.kernel_size,
                             up_kernel_size=self.up_kernel_size,
                             num_res_units=self.num_res_units, act=self.act,
                             norm_down=self.norm_down, norm_up=self.norm_up,
                             dropout=self.dropout, bias=self.bias,
                             adn_ordering=self.adn_ordering, is_top=False,
                             name="sub")
        else:
            sub = self._down(self.channels[1], 1, "bottom")
        x = SkipConnection(submodule=sub, mode="cat", name="skip")(
            x, modalities, train=train)

        up_conv_only = self.is_top and self.num_res_units == 0
        x = Convolution(out_channels=self.out_channels, strides=s,
                        kernel_size=self.up_kernel_size, act=self.act,
                        norm=self.norm_up, dropout=self.dropout or None,
                        use_bias=self.bias, conv_only=up_conv_only,
                        is_transposed=True, adn_ordering=self.adn_ordering,
                        name="up")(x, modalities, train=train)
        if self.num_res_units > 0:
            x = ResidualUnit(out_channels=self.out_channels, strides=1,
                             kernel_size=self.kernel_size, subunits=1,
                             act=self.act, norm=self.norm_up,
                             dropout=self.dropout or None, use_bias=self.bias,
                             last_conv_only=self.is_top,
                             adn_ordering=self.adn_ordering,
                             name="up_ru")(x, modalities, train=train)
        return x


class UNet(nn.Module):
    in_channels: int
    out_channels: int
    channels: Sequence[int]
    strides: Sequence[int]
    kernel_size: int | Sequence[int] = 3
    up_kernel_size: int | Sequence[int] = 3
    num_res_units: int = 0
    act: str | tuple = "prelu"
    norm_down: NormSpec = ("instance", {})
    norm_up: NormSpec = ("instance", {})
    dropout: float = 0.0
    bias: bool = True
    adn_ordering: str = "NDA"

    # encoder = every down layer + the bottom block at any recursion depth
    # (unet.py:195-201 freezes down/bottom but leaves the decoder trainable);
    # fnmatch patterns over the full param path — see train/optim.freeze_mask
    ENCODER_PREFIXES = ("*/down/*", "*/bottom/*")

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        if len(self.channels) < 2:
            raise ValueError("the length of `channels` should be no less than 2.")
        delta = len(self.strides) - (len(self.channels) - 1)
        if delta < 0:
            raise ValueError("the length of `strides` should equal to "
                             "`len(channels) - 1`.")
        if delta > 0:
            warnings.warn(f"`len(strides) > len(channels) - 1`, the last {delta} "
                          "values of strides will not be used.")
        return _UNetLevel(
            out_channels=self.out_channels, channels=tuple(self.channels),
            strides=tuple(self.strides[:len(self.channels) - 1]),
            kernel_size=self.kernel_size, up_kernel_size=self.up_kernel_size,
            num_res_units=self.num_res_units, act=self.act,
            norm_down=self.norm_down, norm_up=self.norm_up,
            dropout=float(self.dropout), bias=self.bias,
            adn_ordering=self.adn_ordering, is_top=True,
            name="model")(x, modalities, train=train)


def _nearest_upsample(x, factor: int):
    """Nearest-neighbour upsample by an integer factor on all spatial dims."""
    for axis in range(1, x.ndim - 1):
        x = jnp.repeat(x, factor, axis=axis)
    return x


class UNetVanilla(nn.Module):
    in_channels: int
    out_channels: int
    channels: Sequence[int]
    strides: Sequence[int]
    kernel_size: int | Sequence[int] = 3
    up_kernel_size: int | Sequence[int] = 3
    num_res_units: int = 0
    act: str | tuple = "prelu"
    norm_down: NormSpec = ("instance", {})
    norm_up: NormSpec = ("instance", {})
    dropout: float = 0.0
    bias: bool = True
    adn_ordering: str = "NDA"

    ENCODER_PREFIXES = ("pre_conv", "down_path")

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        ch, st = list(self.channels), list(self.strides)
        x = Convolution(out_channels=ch[0], kernel_size=self.kernel_size,
                        strides=st[0], conv_only=True, name="pre_conv")(x)
        skips = [x]
        for scale in range(1, len(ch)):
            x = ResidualUnit(out_channels=ch[scale], strides=st[scale],
                             kernel_size=self.kernel_size, subunits=2,
                             act=self.act, norm=self.norm_down,
                             dropout=self.dropout or None, use_bias=self.bias,
                             adn_ordering=self.adn_ordering,
                             name=f"down_path_{scale - 1}_0")(x, modalities, train=train)
            for i in range(1, self.num_res_units):
                x = ResidualUnit(out_channels=ch[scale], strides=1,
                                 kernel_size=self.kernel_size, subunits=2,
                                 act=self.act, norm=self.norm_down,
                                 dropout=self.dropout or None, use_bias=self.bias,
                                 adn_ordering=self.adn_ordering,
                                 name=f"down_path_{scale - 1}_{i}")(x, modalities,
                                                                    train=train)
            skips.append(x)

        for idx, scale in enumerate(range(len(ch) - 2, -1, -1)):
            x = _nearest_upsample(x, st[scale + 1])
            x = jnp.concatenate([skips[scale], x], axis=-1)
            x = ResidualUnit(out_channels=ch[scale], strides=1,
                             kernel_size=self.kernel_size, subunits=2,
                             act=self.act, norm=self.norm_up,
                             dropout=self.dropout or None, use_bias=self.bias,
                             adn_ordering=self.adn_ordering,
                             name=f"up_path_{idx}")(x, modalities, train=train)
        return Convolution(out_channels=self.out_channels, kernel_size=1,
                           strides=1, conv_only=True, name="out")(x)
