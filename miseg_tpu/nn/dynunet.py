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


class _KernelP(nn.Module):
    """Bare conv-kernel param, path-compatible with `nn.Conv`'s ("kernel")."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _ConvP(nn.Module):
    """Parameter stand-in for `_conv(...)` — identical tree
    (`<name>/conv/kernel`), returns the kernel array for fused kernels."""
    cin: int
    cout: int
    k: tuple = (3, 3, 3)

    @nn.compact
    def __call__(self):
        return _KernelP(shape=(*self.k, self.cin, self.cout), name="conv")()


class _NormP(nn.Module):
    """Parameter stand-in for `Norm` (`<name>/scale`, `<name>/bias`)."""
    features: int
    num_styles: int | None  # None → plain [C] affine

    @nn.compact
    def __call__(self):
        shape = ((self.num_styles, self.features) if self.num_styles
                 else (self.features,))
        return (self.param("scale", nn.initializers.ones, shape),
                self.param("bias", nn.initializers.zeros, shape))


def _fuse_plan(norm, act, dropout, x, modalities, kernel_size, stride, train,
               out_channels):
    """Return (slope, num_styles, eps, styles) when the whole block can run
    through the fused Pallas conv chain, else None."""
    from ..ops.dispatch import use_pallas_conv
    if not use_pallas_conv():
        return None
    from ..ops.pallas import fused_conv
    slope = leaky_slope(act)
    kind, kw = (norm, {}) if isinstance(norm, str) else norm
    from ..ops.pallas import fused_norm
    if (slope is None or (dropout and train)
            or kind not in ("instance", "instance_cond")
            or not kw.get("affine", kw.get("elementwise_affine", True))
            or (kind == "instance_cond" and modalities is None)
            or not fused_conv.supported(x.shape, kernel_size, stride,
                                        out_channels)
            or not fused_norm.supported((*x.shape[:-1], out_channels))):
        return None
    num_styles = kw.get("num_styles", 2) if kind == "instance_cond" else None
    styles = modalities if kind == "instance_cond" else None
    return slope, num_styles, float(kw.get("eps", 1e-5)), styles


class UnetResBlock(nn.Module):
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    norm: NormSpec = ("instance", {})
    act: str | tuple = _LRELU
    dropout: float | None = None

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        plan = _fuse_plan(self.norm, self.act, self.dropout, x, modalities,
                          self.kernel_size, self.stride, train,
                          self.out_channels)
        if plan is not None:
            return self._fused(x, modalities, plan, train)
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

    def _fused(self, x, modalities, plan, train):
        """conv1 -> [norm1+act folded into conv2's read] -> conv2 with
        output stats -> one-pass norm2+norm3(residual)+add+act.  Same math
        and parameter tree as the unfused path; activations stay in one
        layout across the whole chain (BASELINE.md round-2: the XLA
        lowering spends over half the flagship window in layout transforms
        around these convs)."""
        import numpy as np

        from ..ops.pallas import fused_conv, fused_norm
        slope, num_styles, eps, styles = plan
        cin, cout = x.shape[-1], self.out_channels
        n = int(np.prod(x.shape[1:-1]))
        w1 = _ConvP(cin, cout, name="conv1")()
        g1, b1 = _NormP(cout, num_styles, name="norm1")()
        w2 = _ConvP(cout, cout, name="conv2")()
        g2, b2 = _NormP(cout, num_styles, name="norm2")()
        y1, s1 = fused_conv.conv3_norm_stats(x, w1.astype(x.dtype))
        sc1, sh1 = fused_conv.norm_columns(s1, n, g1, b1, styles, eps)
        y2, s2 = fused_conv.conv3_norm_stats(y1, w2.astype(x.dtype), sc1, sh1,
                                             slope=slope)
        sc2, sh2 = fused_conv.norm_columns(s2, n, g2, b2, styles, eps)
        if cin != cout:  # stride is 1 whenever _fuse_plan accepts
            w3 = _ConvP(cin, cout, k=(1, 1, 1), name="conv3")()
            g3, b3 = _NormP(cout, num_styles, name="norm3")()
            res = jnp.einsum("...c,co->...o", x, w3[0, 0, 0].astype(x.dtype))
            s3 = fused_norm.channel_stats(res)
            sc3, sh3 = fused_conv.norm_columns(s3, n, g3, b3, styles, eps)
        else:
            res = x
            sc3 = jnp.ones((x.shape[0], cout), jnp.float32)
            sh3 = jnp.zeros((x.shape[0], cout), jnp.float32)
        return fused_norm.apply_norm2_act(y2, sc2, sh2, res, sc3, sh3,
                                          negative_slope=slope)


class UnetBasicBlock(nn.Module):
    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    norm: NormSpec = ("instance", {})
    act: str | tuple = _LRELU
    dropout: float | None = None

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        plan = _fuse_plan(self.norm, self.act, self.dropout, x, modalities,
                          self.kernel_size, self.stride, train,
                          self.out_channels)
        if plan is not None:
            return self._fused(x, modalities, plan, train)
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

    def _fused(self, x, modalities, plan, train):
        """conv -> [norm+act on read] -> conv -> one-pass norm+act (see
        UnetResBlock._fused)."""
        import numpy as np

        from ..ops.pallas import fused_conv, fused_norm
        slope, num_styles, eps, styles = plan
        cin, cout = x.shape[-1], self.out_channels
        n = int(np.prod(x.shape[1:-1]))
        w1 = _ConvP(cin, cout, name="conv1")()
        g1, b1 = _NormP(cout, num_styles, name="norm1")()
        w2 = _ConvP(cout, cout, name="conv2")()
        g2, b2 = _NormP(cout, num_styles, name="norm2")()
        y1, s1 = fused_conv.conv3_norm_stats(x, w1.astype(x.dtype))
        sc1, sh1 = fused_conv.norm_columns(s1, n, g1, b1, styles, eps)
        y2, s2 = fused_conv.conv3_norm_stats(y1, w2.astype(x.dtype), sc1, sh1,
                                             slope=slope)
        sc2, sh2 = fused_conv.norm_columns(s2, n, g2, b2, styles, eps)
        return fused_norm.apply_norm_act(y2, sc2, sh2, negative_slope=slope)


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
