#!/usr/bin/env python
"""Gradient-parity gate: one train step's gradients at IDENTICAL weights,
reference engine vs ours, reported per parameter group.

The convergence race (parity_train.py) bounds end-to-end drift; this gate
localizes it.  Both frameworks compute d loss/d params for the SAME batch
from the SAME torch-initialized weights (translated by train/ref_import),
f32, train-mode forward, dice_focal criterion — then every gradient leaf
is compared after mapping the torch grads through the same tensor
transposes as the weights (the map is per-tensor reshape/transpose, so
cotangents transform identically).  A systematic math divergence shows up
as one param group whose relative error sits orders above the ~1e-6
arithmetic floor; benign reduction-order noise is uniform across groups.

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/grad_parity.py \
      [--model swin_unetr] [--shape 64] [--top 25] [--torch-f64]
      [--fix-ref-grads]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import parity_train  # noqa: E402


def torch_grads(args, b0):
    """Reference model + criterion (its own code, stubbed monai): one
    forward/backward; returns (state_dict copy, logits, loss, grads)."""
    import torch

    from miseg_tpu.compat.monai_train_stub import install_monai_train_stub
    install_monai_train_stub()

    import networks.nets.unet as unet_mod
    from networks.norms.utils import parse_normalization
    from monai.losses import DiceFocalLoss

    torch.manual_seed(args.seed)
    cond = parse_normalization("instance_cond", True, None, 2)
    inst = parse_normalization("instance", True, None, 2)
    fs = args.feature_size
    if args.model == "swin_unetr":
        import networks.nets.swin_unetr as swin_mod
        model = swin_mod.SwinUNETR(
            img_size=(args.shape,) * 3, in_channels=1,
            out_channels=args.classes, feature_size=fs,
            num_heads=(2, 4, 8, 16), depths=(2, 2, 2, 2),
            encoder_norm_name=cond, vit_norm_name=cond,
            decoder_norm_name=inst)
    else:
        model = unet_mod.UNet(
            spatial_dims=3, in_channels=1, out_channels=args.classes,
            channels=[fs * 2, fs * 4, fs * 8], strides=[2, 2],
            num_res_units=2, norm_down=cond, norm_up=inst)
    criterion = DiceFocalLoss(to_onehot_y=True, softmax=True,
                              squared_pred=True, smooth_nr=0.0,
                              smooth_dr=1e-6)
    if getattr(args, "fix_ref_grads", False):
        n = parity_train.fix_reference_norm_grads(model, torch)
        print(f"[fix] contiguous-grad hooks on {n} InstanceNorm modules")
    state0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    tb = parity_train.to_torch(b0, torch)
    model.train()
    logits = model(tb["image"], tb["modality"])
    loss = criterion(logits, tb["label"])
    loss.backward()
    grads = {k: p.grad.detach().numpy().astype(np.float32)
             for k, p in model.named_parameters() if p.grad is not None}
    grads64 = None
    if getattr(args, "torch_f64", False):
        # ground-truth arm: the SAME model/batch in f64 — rounding-free
        # reference gradients that separate math divergence (shows up in
        # ours-f32 vs torch-f64 but not torch-f32 vs torch-f64) from f32
        # conditioning (both pairs deviate equally)
        model64 = model.double()
        model64.zero_grad()
        logits64 = model64(tb["image"].double(), tb["modality"])
        loss64 = criterion(logits64, tb["label"])
        loss64.backward()
        grads64 = {k: p.grad.detach().numpy().astype(np.float64)
                   for k, p in model64.named_parameters()
                   if p.grad is not None}
    return state0, logits.detach().numpy(), float(loss), grads, grads64


def jax_grads(args, b0, torch_state):
    """Our Trainer's exact loss_of (engine.py train step) differentiated
    at the translated weights; returns (loss, grad tree, params tree)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from miseg_tpu.config import Config
    from miseg_tpu.train.engine import Trainer
    from miseg_tpu.train.pretrained import partial_load
    from miseg_tpu.train.ref_import import reference_to_flax

    common = dict(out_channels=args.classes,
                  roi_x=args.shape, roi_y=args.shape, roi_z=args.shape,
                  criterion="dice_focal", smooth_nr=0.0, smooth_dr=1e-6,
                  optim_name="adamw", lr=args.lr,
                  max_epochs=2, no_amp=True, sw_batch_size=1)
    if args.model == "swin_unetr":
        cfg = Config(model_name="swin_unetr",
                     feature_size=[args.feature_size], num_heads=2,
                     encoder_norm_name="instance_cond",
                     vit_norm_name="instance_cond",
                     decoder_norm_name="instance", **common)
    else:
        cfg = Config(model_name="unet",
                     feature_size=[args.feature_size], num_layers=3,
                     strides=[2, 2], num_res_units=2,
                     encoder_norm_name="instance_cond",
                     decoder_norm_name="instance", **common)
    from jax.sharding import Mesh
    trainer = Trainer(cfg, mesh=Mesh(np.array(jax.devices()[:1]), ("data",)),
                      workdir=tempfile.mkdtemp(prefix="grad_parity_"))
    state = trainer.init_state(b0["image"][:1], b0["modality"][:1])
    mapped = reference_to_flax(
        args.model, {k: np.asarray(v) for k, v in torch_state.items()})
    params = partial_load(state.params, mapped, verbose=False)

    image = jnp.asarray(b0["image"])
    label = jnp.asarray(b0["label"])
    modality = jnp.asarray(b0["modality"])
    rng = jax.random.PRNGKey(0)

    def loss_of(p):
        logits, _ = trainer.apply_fn(p, image, modality, train=True,
                                     rng=rng, extra_vars=state.extra_vars,
                                     mutable=True)
        return trainer.loss_fn(logits, label)

    loss, grads = jax.jit(jax.value_and_grad(loss_of))(params)
    return float(loss), jax.device_get(grads), params


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="swin_unetr",
                   choices=["unet", "swin_unetr"])
    p.add_argument("--shape", type=int, default=64)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--feature-size", type=int, default=12)
    p.add_argument("--volumes", type=int, default=1)
    p.add_argument("--val-volumes", type=int, default=1)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--torch-f64", action="store_true",
                   help="add a torch f64 ground-truth arm and report both "
                        "frameworks' f32 deviation from it per leaf")
    p.add_argument("--fix-ref-grads", action="store_true",
                   help="apply parity_train.fix_reference_norm_grads "
                        "(contiguous-cotangent hooks) to the torch model")
    args = p.parse_args()
    if args.model == "swin_unetr" and args.feature_size % 12:
        args.feature_size = 12

    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    epochs, _ = parity_train.make_data(args)
    b0 = epochs[0][0]
    torch_state, ref_logits, ref_loss, tgrads, tgrads64 = torch_grads(args, b0)
    jloss, jgrads, params = jax_grads(args, b0, torch_state)

    from miseg_tpu.train.ref_import import reference_to_flax
    mapped_grads = reference_to_flax(args.model, tgrads)
    mapped_grads64 = (reference_to_flax(args.model, tgrads64)
                      if tgrads64 is not None else None)

    import jax

    def flat(tree):
        out = {}
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(str(getattr(q, "key", getattr(q, "idx", "?")))
                           for q in path)
            out[key] = np.asarray(v)
        return out

    ref_flat, ours_flat = flat(mapped_grads), flat(jgrads)
    truth_flat = flat(mapped_grads64) if mapped_grads64 is not None else None
    rows = []
    for key, ours in ours_flat.items():
        if key not in ref_flat:
            rows.append(dict(param=key, status="missing-in-reference"))
            continue
        ref = ref_flat[key]
        if ref.shape != ours.shape:
            rows.append(dict(param=key, status="shape-mismatch",
                             ref=list(ref.shape), ours=list(ours.shape)))
            continue
        denom = float(np.max(np.abs(ref))) or 1e-30
        abserr = float(np.max(np.abs(ref - ours)))
        row = dict(param=key, rel=abserr / denom, abserr=abserr,
                   ref_absmax=denom)
        if truth_flat is not None:
            t64 = truth_flat[key]
            row["torch32_vs_t64"] = float(np.max(np.abs(ref - t64)))
            row["ours32_vs_t64"] = float(np.max(np.abs(ours - t64)))
        rows.append(row)
    sort_key = "ours32_vs_t64" if truth_flat is not None else "rel"
    rows.sort(key=lambda r: -r.get(sort_key, float("inf")))
    if truth_flat is not None:
        t = sum(r["torch32_vs_t64"] for r in rows if "torch32_vs_t64" in r)
        o = sum(r["ours32_vs_t64"] for r in rows if "ours32_vs_t64" in r)
        print(json.dumps(dict(sum_abserr_torch32_vs_t64=t,
                              sum_abserr_ours32_vs_t64=o,
                              ours_vs_torch_noise_ratio=o / t if t else None)))
    print(json.dumps(dict(loss_reference=ref_loss, loss_ours=jloss,
                          loss_delta=jloss - ref_loss,
                          n_leaves=len(rows))))
    for r in rows[:args.top]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
