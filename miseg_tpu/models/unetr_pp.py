"""Pipeline-parallel UNETR forward: the ViT encoder as an S-stage GPipe
over a mesh "pp" axis, the conv encoders/decoders data-parallel.

The reference has no pipeline parallelism (SURVEY §2.8; its only
parallelism is DDP), so this is a capability extension, wired as a real
`Trainer` mode (`Config.pipeline_parallel`) like FSDP/SP/TP: UNETR's ViT
consumes hidden states after blocks L/4, L/2, 3L/4
(models/unetr.py:83-110; reference networks/nets/unetr.py:254-276), and
those taps fall INSIDE pipeline stages in general, so the GPipe schedule
(parallel/pipeline.py) collects every in-stage layer output through its
aux channel — hidden state i lives at `aux[i // per, i % per]`, valid
for any stage count S dividing num_layers.

Equivalence contract: with dropout_rate == 0 this forward is numerically
the serial `UNETR.__call__` (same params tree, same taps) — certified by
tests/test_pipeline.py::test_unetr_pp_* (forward + grads vs serial on an
8-device CPU mesh) and driven as a real train step in the multichip dry
run.  With dropout > 0 the per-layer rng folding differs from flax's
module-path folding, so the engine refuses PP + dropout rather than
silently training a different model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..nn.dynunet import UnetOutBlock
from ..nn.norms import make_norm
from ..nn.patch_embedding import PatchEmbeddingBlock
from ..nn.transformer import TransformerBlock
from ..nn.unetr_blocks import UnetrBasicBlock, UnetrPrUpBlock, UnetrUpBlock
from ..parallel.pipeline import pipeline_apply, stack_stages
from .unetr import UNETR


def unetr_pipeline_forward(model: UNETR, params, x_in, modalities, *,
                           mesh: Mesh, microbatches: int, axis: str = "pp",
                           data_axis: str | None = None,
                           train: bool = False):
    """UNETR forward with the ViT blocks GPipe-scheduled over mesh[axis].

    `params` is the UNCHANGED serial param tree (vit/blocks_i etc.) — the
    stage-stacking happens in-graph, so grads come back per-block and the
    optimizer/checkpoint state is identical to the serial mode.
    """
    if model.dropout_rate and train:
        raise ValueError("pipeline_parallel requires dropout_rate == 0 "
                         "(in-stage rng folding differs from the serial "
                         "module-path folding)")
    n_stages = int(mesh.shape[axis])
    L = model.num_layers
    if L % n_stages:
        raise ValueError(f"num_layers {L} not divisible by {n_stages} "
                         f"pipeline stages")
    per = L // n_stages
    q = L // 4
    nd = len(model.img_size)
    patch_size = (16,) * nd
    feat_size = tuple(s // p for s, p in zip(model.img_size, patch_size))

    def proj_feat(tokens):
        return tokens.reshape(tokens.shape[0], *feat_size, model.hidden_size)

    vit_p = params["vit"]
    tokens = PatchEmbeddingBlock(
        img_size=tuple(model.img_size), patch_size=patch_size,
        hidden_size=model.hidden_size, num_heads=model.num_heads,
        pos_embed=model.pos_embed, dropout_rate=model.dropout_rate,
    ).apply({"params": vit_p["patch_embedding"]}, x_in, train=train)

    blk = TransformerBlock(
        hidden_size=model.hidden_size, mlp_dim=model.mlp_dim,
        num_heads=model.num_heads, dropout_rate=model.dropout_rate,
        qkv_bias=model.qkv_bias, norm=model.vit_norm)

    def stage_fn(stage_params, h, mods):
        def body(hh, layer_params):
            hh = blk.apply({"params": layer_params}, hh, mods, train=train)
            return hh, hh
        h, outs = jax.lax.scan(body, h, stage_params)  # outs [per, ...]
        return h, outs

    stacked = stack_stages([vit_p[f"blocks_{i}"] for i in range(L)],
                           n_stages)
    ys, hs = pipeline_apply(stage_fn, stacked, tokens, modalities,
                            mesh=mesh, axis=axis, microbatches=microbatches,
                            data_axis=data_axis, with_aux=True)

    def hidden(i):  # ViT's hidden_states_out[i] (output after block i)
        return hs[i // per, i % per]

    x = make_norm(model.vit_norm, model.hidden_size).apply(
        {"params": vit_p["norm"]}, ys[-1], modalities, train=train)

    fs = model.feature_size
    enc1 = UnetrBasicBlock(
        out_channels=fs, kernel_size=3, stride=1, norm=model.encoder_norm,
        res_block=model.res_block,
    ).apply({"params": params["encoder1"]}, x_in, modalities, train)
    enc2 = UnetrPrUpBlock(
        out_channels=fs * 2, num_layer=2, kernel_size=3, stride=1,
        upsample_kernel_size=2, norm=model.encoder_norm,
        conv_block=model.conv_block, res_block=model.res_block,
    ).apply({"params": params["encoder2"]}, proj_feat(hidden(q)),
            modalities, train=train)
    enc3 = UnetrPrUpBlock(
        out_channels=fs * 4, num_layer=1, kernel_size=3, stride=1,
        upsample_kernel_size=2, norm=model.encoder_norm,
        conv_block=model.conv_block, res_block=model.res_block,
    ).apply({"params": params["encoder3"]}, proj_feat(hidden(2 * q)),
            modalities, train=train)
    enc4 = UnetrPrUpBlock(
        out_channels=fs * 8, num_layer=0, kernel_size=3, stride=1,
        upsample_kernel_size=2, norm=model.encoder_norm,
        conv_block=model.conv_block, res_block=model.res_block,
    ).apply({"params": params["encoder4"]}, proj_feat(hidden(3 * q)),
            modalities, train=train)

    dec4 = proj_feat(x)
    dec3 = UnetrUpBlock(
        out_channels=fs * 8, kernel_size=3, upsample_kernel_size=2,
        norm=model.decoder_norm, res_block=model.res_block,
    ).apply({"params": params["decoder5"]}, dec4, enc4, modalities, train)
    dec2 = UnetrUpBlock(
        out_channels=fs * 4, kernel_size=3, upsample_kernel_size=2,
        norm=model.decoder_norm, res_block=model.res_block,
    ).apply({"params": params["decoder4"]}, dec3, enc3, modalities, train)
    dec1 = UnetrUpBlock(
        out_channels=fs * 2, kernel_size=3, upsample_kernel_size=2,
        norm=model.decoder_norm, res_block=model.res_block,
    ).apply({"params": params["decoder3"]}, dec2, enc2, modalities, train)
    out = UnetrUpBlock(
        out_channels=fs, kernel_size=3, upsample_kernel_size=2,
        norm=model.decoder_norm, res_block=model.res_block,
    ).apply({"params": params["decoder2"]}, dec1, enc1, modalities, train)
    return UnetOutBlock(out_channels=model.out_channels).apply(
        {"params": params["out"]}, out, train=train)
