#!/usr/bin/env python
"""Jacobian-element arbitration: dy[j]/dx[i] for one (i, j) pair by
finite differences AND autodiff on BOTH frameworks.  The forwards agree
pointwise everywhere tested, so if one framework's autodiff disagrees
with its own FD slope, that framework's backward is broken.

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/debug_jac.py
"""

from __future__ import annotations

import json
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    args = Namespace(shape=64, classes=4, feature_size=12, seed=0)

    import torch

    from miseg_tpu.compat.monai_train_stub import install_monai_train_stub
    install_monai_train_stub()
    import networks.nets.swin_unetr as swin_mod
    from networks.norms.utils import parse_normalization

    torch.manual_seed(args.seed)
    cond = parse_normalization("instance_cond", True, None, 2)
    inst = parse_normalization("instance", True, None, 2)
    model = swin_mod.SwinUNETR(
        img_size=(args.shape,) * 3, in_channels=1,
        out_channels=args.classes, feature_size=args.feature_size,
        num_heads=(2, 4, 8, 16), depths=(2, 2, 2, 2),
        encoder_norm_name=cond, vit_norm_name=cond,
        decoder_norm_name=inst)
    state0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    lt = model.swinViT.layers1[0]
    lt.train()

    rng = np.random.default_rng(7)
    res, cin = 32, 12
    x_np = rng.standard_normal((2, cin, res, res, res)).astype(np.float32)
    mods_np = np.array([0, 1], np.int64)

    # input coordinate i (channel-first) and output coordinate j; the
    # output grid is 16^3 x 24ch after PatchMerging — pick j in the same
    # spatial neighborhood so the Jacobian entry is appreciable
    i = (1, 11, 18, 26, 9)
    j = (1, 5, 9, 13, 4)

    def torch_y(x):
        with torch.no_grad():
            return lt(torch.from_numpy(x),
                      modalities=torch.from_numpy(mods_np)).numpy()

    def torch_ad():
        x = torch.from_numpy(x_np).requires_grad_(True)
        y = lt(x, modalities=torch.from_numpy(mods_np))
        y[j].backward()
        return float(x.grad[i])

    import jax
    import jax.numpy as jnp

    from miseg_tpu.config import Config
    from miseg_tpu.models.factory import _norm_specs
    from miseg_tpu.models.swin_transformer import BasicLayer
    from miseg_tpu.train.pretrained import partial_load
    from miseg_tpu.train.ref_import import reference_to_flax

    cfg = Config(model_name="swin_unetr", out_channels=4, feature_size=[12],
                 num_heads=2, roi_x=64, roi_y=64, roi_z=64,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond", decoder_norm_name="instance")
    vit_norm, _, _ = _norm_specs(cfg)
    layer = BasicLayer(dim=12, depth=2, num_heads=2, window_size=(7, 7, 7),
                       drop_path=[0.0, 0.0], mlp_ratio=4.0, qkv_bias=True,
                       drop=0.0, attn_drop=0.0, downsample="merging",
                       use_checkpoint=False, norm=vit_norm)
    full = reference_to_flax(
        "swin_unetr", {k: np.asarray(v) for k, v in state0.items()})
    modsj = jnp.asarray(mods_np.astype(np.int32))
    shapes = jax.eval_shape(lambda: layer.init(
        {"params": jax.random.key(0)},
        jnp.zeros((2, res, res, res, cin), jnp.float32), modsj, train=True))
    params = partial_load(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes["params"]),
        full["swinViT"]["layers1"], verbose=False)

    jcl = (j[0], j[2], j[3], j[4], j[1])  # channel-last output coord
    icl = (i[0], i[2], i[3], i[4], i[1])

    def ours_y(x):
        xj = jnp.asarray(np.moveaxis(x, 1, -1))
        return np.moveaxis(np.asarray(
            layer.apply({"params": params}, xj, modsj, train=True)), -1, 1)

    def ours_ad():
        def f(xj):
            return layer.apply({"params": params}, xj, modsj,
                               train=True)[jcl]
        g = jax.grad(f)(jnp.asarray(np.moveaxis(x_np, 1, -1)))
        return float(np.asarray(g)[icl])

    out = {}
    for h in (1e-2, 1e-1):
        xp, xm = x_np.copy(), x_np.copy()
        xp[i] += h
        xm[i] -= h
        out[f"fd_torch_h{h}"] = float((torch_y(xp)[j] - torch_y(xm)[j])
                                      / (2 * h))
        out[f"fd_ours_h{h}"] = float((ours_y(xp)[j] - ours_y(xm)[j])
                                     / (2 * h))
    out["ad_torch"] = torch_ad()
    out["ad_ours"] = ours_ad()
    print(json.dumps(out))


if __name__ == "__main__":
    main()


def pattern() -> None:
    """Support-pattern analysis: full d y[j]/d x fields on both sides."""
    import importlib
    main_mod = sys.modules["__main__"]
