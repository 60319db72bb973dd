"""Pipeline-parallel Swin-UNETR forward: the swin backbone's four
BasicLayer stages as a GPipe over a mesh "pp" axis, the conv
encoders/decoders data-parallel.

The reference has no pipeline parallelism (SURVEY §2.8; its only
parallelism is DDP), so — like models/unetr_pp.py — this is a capability
extension wired through the same `Config.pipeline_parallel` Trainer
mode.  Unlike UNETR's homogeneous ViT stack, swin stages CHANGE the
activation shape (each stage ends in PatchMerging: spatial halves,
channels double — reference networks/nets/swin_transformer.py:228-237),
so the schedule uses `pipeline_apply_hetero`: stages exchange one
canonical flat `[B/M, F]` buffer sized for the stage-0 input, each stage
reshapes its prefix in and zero-pads its (4× smaller) output back out,
and the per-rank stage body is selected by `lax.switch`.

The decoder's skip taps are exactly the stage OUTPUTS (`hidden[1..4]`,
reference networks/nets/swin_unetr.py:353-366), which the GPipe returns
at every boundary (`ys[s]`) — no aux channel needed; `hidden[0]` is the
pre-pipeline patch-embed output.  The per-stage parameter-free
`proj_out` re-normalization (swin_transformer.py:121-145) is applied to
the un-flattened taps on the data-parallel side.

Equivalence contract: with all drop rates == 0 this forward is
numerically the serial `SwinUNETR.__call__` on the same params tree —
certified by tests/test_pipeline.py::test_swin_pp_* (forward + grads +
Trainer-loss vs DP on the 8-device CPU mesh) and driven in the
multichip dry run.  The engine refuses PP + dropout rather than
silently training a different model (rng folding would differ).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.sharding import Mesh

from ..nn.dynunet import UnetOutBlock
from ..nn.swin import PatchEmbed
from ..nn.unetr_blocks import UnetrBasicBlock, UnetrUpBlock
from ..ops.norms import instance_norm, layer_norm
from ..parallel.pipeline import pipeline_apply_hetero
from .swin_transformer import BasicLayer
from .swin_unetr import SwinUNETR, _kind


def swin_unetr_pipeline_forward(model: SwinUNETR, params, x_in, modalities,
                                *, mesh: Mesh, microbatches: int,
                                axis: str = "pp",
                                data_axis: str | None = None,
                                train: bool = False):
    """SwinUNETR forward with the 4 swin stages GPipe-scheduled over
    mesh[axis].  `params` is the UNCHANGED serial param tree, so the
    optimizer/checkpoint state is identical to the serial mode.
    """
    if train and (model.drop_rate or model.attn_drop_rate
                  or model.dropout_path_rate):
        raise ValueError("pipeline_parallel requires all drop rates == 0 "
                         "(in-stage rng folding differs from the serial "
                         "module-path folding)")
    n_stages = int(mesh.shape[axis])
    if n_stages != len(model.depths):
        raise ValueError(f"swin_unetr pipeline needs mesh['{axis}'] == "
                         f"{len(model.depths)} stages, got {n_stages}")
    nd = len(model.img_size)
    fs = model.feature_size
    sw = params["swinViT"]

    x0 = PatchEmbed(patch_size=(2,) * nd, embed_dim=fs, norm=None).apply(
        {"params": sw["patch_embed"]}, x_in, modalities, train=train)
    s0 = x0.shape[1:-1]

    def proj_out(x):
        if not model.normalize:
            return x
        kind = _kind(model.vit_norm)
        if kind == "layer":
            return layer_norm(x)
        if kind in ("instance", "instance_cond"):
            return instance_norm(x)
        return x

    # canonical flat buffer: sized for the stage-0 input (largest)
    flat = int(np.prod(s0)) * fs

    def stage_shape(i):  # input shape of stage i (0-indexed)
        return tuple(s // 2 ** i for s in s0) + (fs * 2 ** i,)

    def make_stage(i):
        layer = BasicLayer(
            dim=int(fs * 2 ** i), depth=model.depths[i],
            num_heads=model.num_heads[i], window_size=(7,) * nd,
            drop_path=(0.0,) * model.depths[i], mlp_ratio=4.0,
            qkv_bias=True, drop=model.drop_rate,
            attn_drop=model.attn_drop_rate, downsample=model.downsample,
            use_checkpoint=model.use_checkpoint, norm=model.vit_norm)
        in_shape = stage_shape(i)
        in_len = int(np.prod(in_shape))

        def fn(p, h, mods):
            hin = h[:, :in_len].reshape((h.shape[0],) + in_shape)
            y = layer.apply({"params": p["swinViT"][f"layers{i + 1}"]},
                            hin, mods, train=train)
            yf = y.reshape(y.shape[0], -1).astype(h.dtype)
            return jnp.pad(yf, ((0, 0), (0, h.shape[1] - yf.shape[1])))

        return fn

    ys = pipeline_apply_hetero(
        [make_stage(i) for i in range(n_stages)], params,
        x0.reshape(x0.shape[0], flat), modalities,
        mesh=mesh, axis=axis, microbatches=microbatches,
        data_axis=data_axis)

    def tap(i):  # hidden[i] for i >= 1: output of stage i-1, un-flattened
        shape = stage_shape(i)
        return ys[i - 1][:, :int(np.prod(shape))].reshape(
            (ys.shape[1],) + shape)

    hidden = [proj_out(x0)] + [proj_out(tap(i)) for i in range(1, 5)]

    basic_cls = (nn.remat(UnetrBasicBlock, static_argnums=(3,))
                 if model.use_checkpoint else UnetrBasicBlock)
    up_cls = (nn.remat(UnetrUpBlock, static_argnums=(4,))
              if model.use_checkpoint else UnetrUpBlock)

    def enc(out_ch, name, x):
        return basic_cls(out_channels=out_ch, kernel_size=3, stride=1,
                         norm=model.encoder_norm, res_block=True).apply(
            {"params": params[name]}, x, modalities, train)

    enc0 = enc(fs, "encoder1", x_in)
    enc1 = enc(fs, "encoder2", hidden[0])
    enc2 = enc(2 * fs, "encoder3", hidden[1])
    enc3 = enc(4 * fs, "encoder4", hidden[2])
    dec4 = enc(16 * fs, "encoder10", hidden[4])

    def dec(out_ch, name, x, skip):
        return up_cls(out_channels=out_ch, kernel_size=3,
                      upsample_kernel_size=2, norm=model.decoder_norm,
                      res_block=True).apply(
            {"params": params[name]}, x, skip, modalities, train)

    dec3 = dec(8 * fs, "decoder5", dec4, hidden[3])
    dec2 = dec(4 * fs, "decoder4", dec3, enc3)
    dec1 = dec(2 * fs, "decoder3", dec2, enc2)
    dec0 = dec(fs, "decoder2", dec1, enc1)
    out = dec(fs, "decoder1", dec0, enc0)
    return UnetOutBlock(out_channels=model.out_channels).apply(
        {"params": params["out"]}, out, train=train)
