"""Convolution and residual-unit blocks (channel-last, rank-agnostic).

Reference parity (networks/blocks/convolutions.py):
  * `Convolution` (:25-180) — (Conv | ConvTranspose) → optional ADN, with
    torch-compatible padding math (`same_padding`, output_padding);
  * `ResidualUnit` (:182-329) — `subunits`× Convolution + residual conv
    (identity, or 1x1 / strided conv when channels/strides change).

TPU-first: convs run in NDHWC (XLA's native TPU layout → MXU tiling);
transposed convs use `lax.conv_transpose` with explicit pads
`(k-1-p, k-1-p+output_padding)`, which reproduces torch's
`out = (n-1)s - 2p + k + op` shape rule.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .adn import ADN

NormSpec = tuple[str, dict[str, Any]] | str | None


def _tuple(v, n: int) -> tuple[int, ...]:
    if isinstance(v, (list, tuple)):
        if len(v) == 1:
            return (int(v[0]),) * n
        if len(v) != n:
            raise ValueError(f"expected length-{n} sequence, got {v}")
        return tuple(int(x) for x in v)
    return (int(v),) * n


def same_padding(kernel_size, dilation=1):
    """Padding that keeps spatial size at stride 1: (k-1)/2 * dilation."""
    k = kernel_size if isinstance(kernel_size, (list, tuple)) else (kernel_size,)
    d = dilation if isinstance(dilation, (list, tuple)) else (dilation,) * len(k)
    if any((ki - 1) % 2 for ki in k):
        if any(ki % 2 == 0 for ki in k):
            raise NotImplementedError("same padding requires odd kernel sizes")
    return tuple((ki - 1) // 2 * di for ki, di in zip(k, d))


def get_padding(kernel_size, stride):
    """dynunet padding rule: (k - s + 1) // 2, per dim (dynunet_block.py:321-333)."""
    k = kernel_size if isinstance(kernel_size, (list, tuple)) else (kernel_size,)
    s = stride if isinstance(stride, (list, tuple)) else (stride,) * len(k)
    pads = tuple(int((ki - si + 1) / 2) for ki, si in zip(k, s))
    if min(pads) < 0:
        raise ValueError("negative padding; change kernel size / stride")
    return pads


def get_output_padding(kernel_size, stride, padding):
    """dynunet transposed-conv rule: 2p + s - k (dynunet_block.py:336-347)."""
    k = kernel_size if isinstance(kernel_size, (list, tuple)) else (kernel_size,)
    s = stride if isinstance(stride, (list, tuple)) else (stride,) * len(k)
    p = padding if isinstance(padding, (list, tuple)) else (padding,) * len(k)
    out = tuple(2 * pi + si - ki for ki, si, pi in zip(k, s, p))
    if min(out) < 0:
        raise ValueError("negative output padding; change kernel size / stride")
    return out


def conv_transpose(x: jax.Array, kernel: jax.Array, strides: Sequence[int],
                   padding: Sequence[int], output_padding: Sequence[int],
                   bias: jax.Array | None = None) -> jax.Array:
    """Channel-last N-D transposed conv with torch padding semantics."""
    pads = [(k - 1 - p, k - 1 - p + op)
            for k, p, op in zip(kernel.shape[:-2], padding, output_padding)]
    nd = len(strides)
    spatial = "DHW"[-nd:] if nd <= 3 else None
    if spatial is None:
        raise ValueError("only 1-3 spatial dims supported")
    dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
    y = lax.conv_transpose(x, kernel.astype(x.dtype), tuple(strides), pads,
                           dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class Convolution(nn.Module):
    """(Conv | ConvTranspose) → optional ADN(act, dropout, norm)."""

    out_channels: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    adn_ordering: str = "NDA"
    act: str | tuple | None = "prelu"
    norm: NormSpec = ("instance", {})
    dropout: float | None = None
    dilation: int | Sequence[int] = 1
    groups: int = 1
    use_bias: bool = True
    conv_only: bool = False
    is_transposed: bool = False
    padding: int | Sequence[int] | None = None
    output_padding: int | Sequence[int] | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        nd = x.ndim - 2
        k = _tuple(self.kernel_size, nd)
        s = _tuple(self.strides, nd)
        d = _tuple(self.dilation, nd)
        pad = (_tuple(self.padding, nd) if self.padding is not None
               else same_padding(k, d))
        if self.is_transposed:
            op = (_tuple(self.output_padding, nd) if self.output_padding is not None
                  else tuple(si - 1 for si in s))  # stride_minus_kernel_padding(1, s)
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (*k, x.shape[-1] // self.groups, self.out_channels))
            bias = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
                    if self.use_bias else None)
            x = conv_transpose(x, kernel, s, pad, op, bias)
        else:
            x = nn.Conv(
                features=self.out_channels, kernel_size=k, strides=s,
                padding=[(p, p) for p in pad], kernel_dilation=d,
                feature_group_count=self.groups, use_bias=self.use_bias,
                dtype=self.dtype, name="conv",
            )(x)
        if self.conv_only or (self.act is None and self.norm is None and not self.dropout):
            return x
        return ADN(channels=self.out_channels, ordering=self.adn_ordering,
                   act=self.act, norm=self.norm, dropout=self.dropout,
                   name="adn")(x, modalities, train=train)


class ResidualUnit(nn.Module):
    """`subunits`× Convolution with an additive residual branch."""

    out_channels: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    subunits: int = 2
    adn_ordering: str = "NDA"
    act: str | tuple | None = "prelu"
    norm: NormSpec = ("instance", {})
    dropout: float | None = None
    dilation: int | Sequence[int] = 1
    use_bias: bool = True
    last_conv_only: bool = False
    padding: int | Sequence[int] | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        nd = x.ndim - 2
        in_channels = x.shape[-1]
        k = _tuple(self.kernel_size, nd)
        s = _tuple(self.strides, nd)
        pad = (_tuple(self.padding, nd) if self.padding is not None
               else same_padding(k, _tuple(self.dilation, nd)))
        subunits = max(1, self.subunits)

        cx = x
        sstrides = s
        for su in range(subunits):
            conv_only = self.last_conv_only and su == subunits - 1
            cx = Convolution(
                out_channels=self.out_channels, kernel_size=k, strides=sstrides,
                adn_ordering=self.adn_ordering, act=self.act, norm=self.norm,
                dropout=self.dropout, dilation=self.dilation, use_bias=self.use_bias,
                conv_only=conv_only, padding=pad, dtype=self.dtype,
                name=f"unit{su}",
            )(cx, modalities, train=train)
            sstrides = (1,) * nd

        res = x
        if any(si != 1 for si in s) or in_channels != self.out_channels:
            rk, rp = (k, pad) if any(si != 1 for si in s) else ((1,) * nd, (0,) * nd)
            res = nn.Conv(features=self.out_channels, kernel_size=rk, strides=s,
                          padding=[(p, p) for p in rp], use_bias=self.use_bias,
                          dtype=self.dtype, name="residual")(x)
        return cx + res
