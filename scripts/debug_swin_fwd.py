#!/usr/bin/env python
"""Forward bisection: perturb the stage input along the coordinate where
the input-gradients disagree most (debug_swin_grad.py), run both
frameworks' layers1 forward at x and x+h·e, and localize the first
intermediate activation that diverges (torch hooks vs flax
capture_intermediates).

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/debug_swin_fwd.py
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
    args = Namespace(shape=64, classes=4, feature_size=12, stage=1, seed=0,
                     volumes=1, val_volumes=1, epochs=1, lr=1e-3,
                     model="swin_unetr")

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

    rng = np.random.default_rng(args.seed + 7)
    res, cin = 32, 12
    x_np = rng.standard_normal((2, cin, res, res, res)).astype(np.float32)
    mods_np = np.array([0, 1], np.int64)

    lt = model.swinViT.layers1[0]
    lt.train()

    # torch hooks: record every submodule output
    acts_t = {}

    def mk_hook(name):
        def hook(mod, inp, out):
            if isinstance(out, torch.Tensor):
                acts_t[name] = out.detach().numpy()
        return hook

    for name, mod in lt.named_modules():
        if name:
            mod.register_forward_hook(mk_hook(name))

    def torch_fwd(x):
        acts_t.clear()
        with torch.no_grad():
            y = lt(torch.from_numpy(x), modalities=torch.from_numpy(mods_np))
        return y.numpy(), dict(acts_t)

    # ours
    import jax
    import jax.numpy as jnp

    from miseg_tpu.config import Config
    from miseg_tpu.models.factory import _norm_specs
    from miseg_tpu.models.swin_transformer import BasicLayer
    from miseg_tpu.train.pretrained import partial_load
    from miseg_tpu.train.ref_import import reference_to_flax

    cfg = Config(model_name="swin_unetr", out_channels=4,
                 feature_size=[12], num_heads=2,
                 roi_x=64, roi_y=64, roi_z=64,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond", decoder_norm_name="instance")
    vit_norm, _, _ = _norm_specs(cfg)
    layer = BasicLayer(dim=12, depth=2, num_heads=2, window_size=(7, 7, 7),
                       drop_path=[0.0, 0.0], mlp_ratio=4.0, qkv_bias=True,
                       drop=0.0, attn_drop=0.0, downsample="merging",
                       use_checkpoint=False, norm=vit_norm)
    full = reference_to_flax(
        "swin_unetr", {k: np.asarray(v) for k, v in state0.items()})
    sub = full["swinViT"]["layers1"]
    modsj = jnp.asarray(mods_np.astype(np.int32))
    shapes = jax.eval_shape(lambda: layer.init(
        {"params": jax.random.key(0)},
        jnp.zeros((2, res, res, res, cin), jnp.float32), modsj, train=True))
    params = partial_load(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes["params"]),
        sub, verbose=False)

    def ours_fwd(x):
        xj = jnp.asarray(np.moveaxis(x, 1, -1))
        y, mods_out = layer.apply({"params": params}, xj, modsj, train=True,
                                  capture_intermediates=True)
        acts = mods_out.get("intermediates", {})
        return np.moveaxis(np.asarray(y), -1, 1), acts

    def compare(tag, x):
        yt, at = torch_fwd(x)
        yo, ao = ours_fwd(x)
        print(json.dumps(dict(tag=tag,
                              out_maxdiff=float(np.max(np.abs(yt - yo))),
                              out_absmax=float(np.max(np.abs(yt))))))
        return yt, at, yo, ao

    compare("base", x_np)
    e = np.zeros_like(x_np)
    e[1, 11, 18, 26, 9] = 1.0
    for h in (1e-3, 1e-2, 1e-1):
        compare(f"perturbed h={h}", x_np + h * e)

    # list torch intermediate names once for manual drill-down
    _, at, _, ao = compare("base2", x_np)
    print("torch modules:", sorted(at.keys()))

    def walk(tree, prefix=""):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out += walk(v, prefix + k + "/")
            else:
                out.append(prefix + k)
        return out
    print("ours intermediates:", sorted(walk(ao)))


if __name__ == "__main__":
    main()
