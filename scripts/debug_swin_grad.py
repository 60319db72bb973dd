#!/usr/bin/env python
"""Cotangent-controlled gradient isolation for one swin stage.

grad_parity.py showed our full-model f32 swin gradients deviate от the
torch-f64 truth ~300x more than torch's own f32 does, concentrated in the
encoder.  This script isolates WHERE: both frameworks' `layers1` (first
BasicLayer: 2 shifted-window blocks + PatchMerging) get the IDENTICAL
input tensor and the IDENTICAL random output cotangent R —
loss = sum(layer(x) * R) — so the comparison covers exactly one stage's
backward with no upstream/downstream contamination.  Arms: torch f32,
torch f64 (truth), ours f32.

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/debug_swin_grad.py \
      [--shape 64] [--stage 1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import json

import parity_train  # noqa: E402  (reuses the identical-weights harness)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, default=64)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--feature-size", type=int, default=12)
    p.add_argument("--stage", type=int, default=1, choices=[1, 2, 3, 4])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--top", type=int, default=12)
    p.add_argument("--randomize-norms", action="store_true")
    args = p.parse_args()
    args.volumes = 1
    args.val_volumes = 1
    args.epochs = 1
    args.lr = 1e-3
    args.model = "swin_unetr"

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
    if args.randomize_norms:
        # norm affine params are scale=1/bias=0 at torch init — any
        # misrouting of WHICH affine tensor applies WHERE is invisible in
        # the forward (γ·x̂+β == x̂) yet O(1)-wrong in the grads.  Randomize
        # them so a routing bug shows up in the forward diff directly.
        g = torch.Generator().manual_seed(9)
        for k, v in list(state0.items()):
            if "norm" in k and k.rsplit(".", 1)[-1] in ("weight", "bias"):
                state0[k] = 0.5 * torch.randn(v.shape, generator=g,
                                              dtype=v.dtype) \
                    + (1.0 if k.endswith("weight") else 0.0)
        model.load_state_dict(state0)

    rng = np.random.default_rng(args.seed + 7)
    # stage input: [B, C, D, H, W] at the stage's token resolution
    res = args.shape // (2 ** args.stage)
    cin = args.feature_size * 2 ** (args.stage - 1)
    x_np = rng.standard_normal((2, cin, res, res, res)).astype(np.float32)
    mods_np = np.array([0, 1], np.int64)
    layer_t = getattr(model.swinViT, f"layers{args.stage}")[0]
    y_probe = layer_t(torch.from_numpy(x_np),
                      modalities=torch.from_numpy(mods_np))
    r_np = rng.standard_normal(tuple(y_probe.shape)).astype(np.float32)

    def torch_arm(dtype):
        m = swin_mod.SwinUNETR(
            img_size=(args.shape,) * 3, in_channels=1,
            out_channels=args.classes, feature_size=args.feature_size,
            num_heads=(2, 4, 8, 16), depths=(2, 2, 2, 2),
            encoder_norm_name=cond, vit_norm_name=cond,
            decoder_norm_name=inst)
        m.load_state_dict(state0)
        if dtype == "f64":
            m = m.double()
        lt = getattr(m.swinViT, f"layers{args.stage}")[0]
        lt.train()
        x = torch.from_numpy(x_np)
        r = torch.from_numpy(r_np)
        if dtype == "f64":
            x, r = x.double(), r.double()
        x.requires_grad_(True)
        y = lt(x, modalities=torch.from_numpy(mods_np))
        (y * r).sum().backward()
        return ({k: q.grad.detach().numpy()
                 for k, q in lt.named_parameters() if q.grad is not None},
                x.grad.detach().numpy())

    g32, xg32 = torch_arm("f32")
    g64, xg64 = torch_arm("f64")

    # ---- ours ----------------------------------------------------------
    import jax
    import jax.numpy as jnp

    from miseg_tpu.config import Config
    from miseg_tpu.models.factory import _norm_specs
    from miseg_tpu.models.swin_transformer import BasicLayer
    from miseg_tpu.train.pretrained import partial_load
    from miseg_tpu.train.ref_import import reference_to_flax

    cfg = Config(model_name="swin_unetr", out_channels=args.classes,
                 feature_size=[args.feature_size], num_heads=2,
                 roi_x=args.shape, roi_y=args.shape, roi_z=args.shape,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    vit_norm, _, _ = _norm_specs(cfg)
    heads = (2, 4, 8, 16)
    layer = BasicLayer(dim=cin, depth=2, num_heads=heads[args.stage - 1],
                       window_size=(7, 7, 7), drop_path=[0.0, 0.0],
                       mlp_ratio=4.0, qkv_bias=True, drop=0.0,
                       attn_drop=0.0, downsample="merging",
                       use_checkpoint=False, norm=vit_norm)
    full = reference_to_flax(
        "swin_unetr", {k: np.asarray(v) for k, v in state0.items()})
    sub = full["swinViT"][f"layers{args.stage}"]

    xj = jnp.asarray(np.moveaxis(x_np, 1, -1))
    rj = jnp.asarray(np.moveaxis(r_np, 1, -1))
    modsj = jnp.asarray(mods_np.astype(np.int32))

    shapes = jax.eval_shape(lambda: layer.init(
        {"params": jax.random.key(0)}, xj, modsj, train=True))
    params0 = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                           shapes["params"])
    params = partial_load(params0, sub, verbose=False)
    n_l, n_m = (len(jax.tree.leaves(params)), len(jax.tree.leaves(sub)))
    assert n_l == n_m, (n_l, n_m)

    def loss_of(p):
        y = layer.apply({"params": p}, xj, modsj, train=True)
        return jnp.sum(y * rj)

    ours = jax.device_get(jax.jit(jax.grad(loss_of))(params))

    # input-gradient comparison: no parameter mapping involved, so any
    # disagreement is a genuine function difference; its spatial pattern
    # localizes the op (window borders ⇒ padding, uniform ⇒ global)
    xgrad = jax.device_get(jax.jit(jax.grad(
        lambda xx: jnp.sum(layer.apply({"params": params}, xx, modsj,
                                       train=True) * rj)))(xj))
    xgrad_cf = np.moveaxis(np.asarray(xgrad), -1, 1)
    xg_t_err = float(np.max(np.abs(xg32 - xg64)))
    xg_o_diff = np.abs(xgrad_cf - xg64)
    xg_o_err = float(np.max(xg_o_diff))
    # where does the worst input-grad error live?
    idx = np.unravel_index(np.argmax(xg_o_diff), xg_o_diff.shape)
    print(json.dumps(dict(xgrad_torch32_vs_t64=xg_t_err,
                          xgrad_ours32_vs_t64=xg_o_err,
                          xgrad_absmax=float(np.max(np.abs(xg64))),
                          worst_at=[int(i) for i in idx])))

    # forward check too
    yj = layer.apply({"params": params}, xj, modsj, train=True)
    fwd32 = float(np.max(np.abs(np.moveaxis(np.asarray(yj), -1, 1)
                                - y_probe.detach().numpy())))

    ref32 = reference_to_flax("swin_unetr", {
        f"swinViT.layers{args.stage}.0.{k}": v for k, v in g32.items()})[
        "swinViT"][f"layers{args.stage}"]
    ref64 = reference_to_flax("swin_unetr", {
        f"swinViT.layers{args.stage}.0.{k}": v.astype(np.float64)
        for k, v in g64.items()})["swinViT"][f"layers{args.stage}"]

    def flat(tree):
        out = {}
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
            out["/".join(str(getattr(q, "key", "?")) for q in path)] = \
                np.asarray(v)
        return out

    f32t, f64t, f32o = flat(ref32), flat(ref64), flat(ours)

    # arbitration: finite-difference slope of OUR loss along a random
    # direction in one leaf vs both gradients' prediction — decides which
    # gradient actually matches the (shared, forward-verified) function
    leaf = "blocks_0/mlp/linear2/kernel"
    d = np.asarray(rng.standard_normal(f32o[leaf].shape), np.float32)
    d /= np.linalg.norm(d)
    import flax
    flat_params = flax.traverse_util.flatten_dict(params, sep="/")
    base = np.asarray(flat_params[leaf])
    h = 1e-3

    def loss_at(delta):
        fp = dict(flat_params)
        fp[leaf] = jnp.asarray(base + delta * d)
        return float(loss_of(flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): v for k, v in fp.items()})))

    fd = (loss_at(h) - loss_at(-h)) / (2 * h)
    print(json.dumps(dict(leaf=leaf, fd_slope=fd,
                          ours_dot=float(np.sum(f32o[leaf] * d)),
                          torch64_dot=float(np.sum(f64t[leaf] * d)),
                          cos_ours_t64=float(
                              np.sum(f32o[leaf] * f64t[leaf])
                              / (np.linalg.norm(f32o[leaf])
                                 * np.linalg.norm(f64t[leaf]) + 1e-30)))))
    rows = []
    for key, truth in f64t.items():
        t_err = float(np.max(np.abs(f32t[key] - truth)))
        o_err = float(np.max(np.abs(f32o[key] - truth)))
        rows.append(dict(param=key, torch32=t_err, ours32=o_err,
                         absmax=float(np.max(np.abs(truth)))))
    rows.sort(key=lambda r: -r["ours32"])
    print(json.dumps(dict(stage=args.stage, fwd32_maxabs=fwd32,
                          sum_torch32=sum(r["torch32"] for r in rows),
                          sum_ours32=sum(r["ours32"] for r in rows))))
    for r in rows[:args.top]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
