#!/usr/bin/env python
"""Convergence-parity harness: the reference's OWN training loop vs ours,
identical weights + identical data + identical recipe.

This closes the north-star accuracy leg (BASELINE.json ±0.5 dice):
golden tests certify forward parity; this harness certifies TRAINING
parity — the reference's raw engine (`/root/reference/utils/trainer.py:
10-255` train_epoch/val_epoch, executed verbatim via
compat/monai_train_stub) and our `Trainer` are started from the SAME
torch-initialized weights (translated by train/ref_import.py), fed the
SAME fixed batch stream (in-memory synthetic MM-WHS-like volumes,
channel-first for torch / channel-last for us), with the same
dice_focal + AdamW + warmup_cosine recipe (utils/training_utils.py:6-87),
amp off both sides (f32) — then their val-dice trajectories and final
`val_total_dice/avg` (identical aggregation: per-class mean_batch →
nanmean over valid classes, utils/trainer.py:224,252) are compared.

Usage:
  python scripts/parity_train.py [--model unet|swin_unetr] [--epochs 8]
      [--volumes 8] [--shape 32] [--classes 4] [--lr 1e-3]
      [--out PARITY_TRAIN.json]

The swin_unetr arm races the FLAGSHIP family (fs=12, heads (2,4,8,16),
depths (2,2,2,2)) — certifying the transformer training path (separable
rel-pos-bias VJP, region-id mask backward, patch-merge/proj_out quirks)
at step level, not just forward golden parity.

Prints one JSON line per eval epoch and a final summary with
delta_dice = ours − reference.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_data(args):
    """Fixed-seed in-memory dataset: train batches interleave one CT + one
    MR volume (the reference's interleaved loader semantics), val is all
    volumes of both modalities.  Images are affine-normalized to ~[0,1]
    (both frameworks see the SAME normalized arrays — no transform chains,
    so nothing but engine math differs)."""
    from miseg_tpu.data.synthetic import _volume

    rng = np.random.default_rng(args.seed)
    shape = (args.shape,) * 3

    def gen(n, modality):
        imgs, labs = [], []
        for _ in range(n):
            img, lab = _volume(rng, shape, args.classes, modality)
            img = (img + 100.0) / 500.0  # HU-ish affine → ~[0, 1]
            imgs.append(img.astype(np.float32))
            labs.append(lab.astype(np.int32))
        return np.stack(imgs), np.stack(labs)
    ct_x, ct_y = gen(args.volumes, 0)
    mr_x, mr_y = gen(args.volumes, 1)
    vct_x, vct_y = gen(args.val_volumes, 0)
    vmr_x, vmr_y = gen(args.val_volumes, 1)

    order_rng = np.random.default_rng(args.seed + 1)
    epochs = []
    for _ in range(args.epochs):
        perm = order_rng.permutation(args.volumes)
        batches = [dict(image=np.stack([ct_x[i], mr_x[i]])[..., None],
                        label=np.stack([ct_y[i], mr_y[i]]),
                        modality=np.array([0, 1], np.int32))
                   for i in perm]
        epochs.append(batches)
    val = [dict(image=np.concatenate([vct_x, vmr_x])[..., None],
                label=np.concatenate([vct_y, vmr_y]),
                modality=np.array([0] * args.val_volumes
                                  + [1] * args.val_volumes, np.int32))]
    return epochs, val


def to_torch(batch, torch):
    """Channel-last numpy batch → the reference loader's channel-first
    torch dict (image/label [B, 1, *spatial], modality [B])."""
    img = torch.from_numpy(np.moveaxis(batch["image"], -1, 1).copy())
    lab = torch.from_numpy(batch["label"][:, None].astype(np.int64))
    return {"image": img, "label": lab,
            "modality": torch.from_numpy(batch["modality"].astype(np.int64))}


def fix_reference_norm_grads(model, torch):
    """Work around a PyTorch 2.13.0-CPU autograd bug the swin parity race
    exposed: InstanceNorm's backward drops the stats-mediated gradient
    terms (returns exactly 0 for every cross-position coupling) whenever
    `grad_output` is a non-contiguous view — FD-vs-autograd arbitration in
    scripts/debug_jac.py, minimal repro in BASELINE.md round 5.  The
    reference wraps every swin cond-norm in einops rearranges
    (swin_transformer_block.py:107-112, patch_merging.py:78-84), so its
    cotangents are always permuted views and every vit norm trains with
    corrupted gradients.  Forcing the cotangent contiguous at each
    InstanceNorm output restores the true gradient (FD-verified)."""

    class _ContiguousGrad(torch.autograd.Function):
        @staticmethod
        def forward(ctx, t):
            # clone: downstream in-place ops on an as-is returned tensor
            # would override the custom backward (torch forbids it)
            return t.clone()

        @staticmethod
        def backward(ctx, g):
            return g.contiguous()

    def hook(mod, inp, out):
        return _ContiguousGrad.apply(out)

    n = 0
    for mod in model.modules():
        if isinstance(mod, torch.nn.modules.instancenorm._InstanceNorm):
            mod.register_forward_hook(hook)
            n += 1
    return n


def run_reference(args, epochs, val, perturb=False):
    """Train the reference's C-UNet with ITS OWN engine, stubbed monai.

    `perturb=True` flips the first weight element by ONE ULP before
    training — the noise-floor arm: racing the reference against this
    perturbed twin of itself measures the recipe's intrinsic chaotic
    spread at the chosen epoch budget, the yardstick any cross-framework
    delta_dice must be read against (f32 reduction-order noise is of the
    same order as 1 ulp)."""
    import torch

    from miseg_tpu.compat.monai_train_stub import install_monai_train_stub
    install_monai_train_stub()

    import networks.nets.unet as unet_mod
    from networks.norms.utils import parse_normalization
    from utils.trainer import train_epoch, val_epoch
    from monai.metrics import DiceMetric
    from monai.losses import DiceFocalLoss
    from monai.optimizers.lr_scheduler import WarmupCosineSchedule
    from monai.transforms import AsDiscrete

    torch.manual_seed(args.seed)
    cond = parse_normalization("instance_cond", True, None, 2)
    inst = parse_normalization("instance", True, None, 2)
    fs = args.feature_size
    if args.model == "swin_unetr":
        # flagship family (VERDICT r4 #3): the transformer training path —
        # rel-pos-bias VJP, region-id mask backward, patch-merge/proj_out
        # quirks — raced at step level against the reference's engine.
        # Reference recipe anchor: /root/reference/README.md:170-173;
        # construction swin_unetr.py:260-301 (num_heads (h,2h,4h,8h),
        # depths (2,2,2,2)).
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
    if getattr(args, "fix_ref_grads", False):
        n = fix_reference_norm_grads(model, torch)
        print(f"[fix] contiguous-grad hooks on {n} InstanceNorm modules",
              flush=True)
    criterion = DiceFocalLoss(to_onehot_y=True, softmax=True,
                              squared_pred=True, smooth_nr=0.0,
                              smooth_dr=1e-6)
    optimizer = torch.optim.AdamW(model.parameters(), lr=args.lr,
                                  weight_decay=args.reg_weight)
    scheduler = WarmupCosineSchedule(optimizer, warmup_steps=args.warmup,
                                     t_total=args.epochs)
    acc_func = DiceMetric(include_background=True, reduction="mean_batch",
                          get_not_nans=True)
    post_label = AsDiscrete(to_onehot=args.classes)
    post_pred = AsDiscrete(argmax=True, to_onehot=args.classes)

    if perturb:
        with torch.no_grad():
            if getattr(args, "noise_scale", 0.0):
                # every-weight relative perturbation at f32-rounding scale:
                # a twin that differs from the reference the way a second
                # f32 framework does (different reduction orders re-round
                # every tensor) — vs the single-element 1-ulp twin below
                g = torch.Generator().manual_seed(args.seed + 12345)
                for p in model.parameters():
                    p.mul_(1 + args.noise_scale
                           * torch.randn(p.shape, generator=g))
            else:
                p = next(model.parameters())
                flat = p.view(-1)
                flat[0] = torch.nextafter(flat[0], torch.tensor(float("inf")))
    state0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    b0 = to_torch(epochs[0][0], torch)
    model.eval()
    with torch.no_grad():
        logits0 = model(b0["image"], b0["modality"]).numpy()
    model.train()
    history = []
    for epoch, batches in enumerate(epochs):
        loader = [to_torch(b, torch) for b in batches]
        loss = train_epoch(model, loader, optimizer, criterion,
                           device="cpu", scaler=None, amp=False)
        scheduler.step()
        if (epoch + 1) % args.eval_every == 0 or epoch + 1 == len(epochs):
            vl = [to_torch(b, torch) for b in val]
            val_loss, acc, _ = val_epoch(
                model, vl, criterion, "cpu", acc_func, post_label,
                post_pred, model_inferer=None, amp=False)
            history.append(dict(epoch=epoch, train_loss=float(loss),
                                val_loss=float(val_loss), dice=float(acc)))
            print(f"[reference] epoch {epoch}: train={loss:.4f} "
                  f"val={val_loss:.4f} dice={acc:.4f}", flush=True)
    return state0, logits0, history


def run_ours(args, epochs, val, torch_state, ref_logits0):
    """Our Trainer, seeded with the SAME torch-initialized weights."""
    import jax
    import jax.numpy as jnp

    from miseg_tpu.config import Config
    from miseg_tpu.train.engine import Trainer
    from miseg_tpu.train.optim import set_learning_rate
    from miseg_tpu.train.pretrained import partial_load
    from miseg_tpu.train.ref_import import reference_to_flax

    common = dict(out_channels=args.classes,
                  roi_x=args.shape, roi_y=args.shape, roi_z=args.shape,
                  criterion="dice_focal", smooth_nr=0.0, smooth_dr=1e-6,
                  optim_name="adamw", lr=args.lr, reg_weight=args.reg_weight,
                  scheduler="warmup_cosine", warmup_epochs=args.warmup,
                  max_epochs=args.epochs, no_amp=True, sw_batch_size=1)
    if args.model == "swin_unetr":
        # mirror run_reference's construction: num_heads=2 -> (2,4,8,16),
        # depth_swin_block default [2] -> (2,2,2,2)
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
    import tempfile

    from jax.sharding import Mesh

    # a 1-device mesh regardless of how many devices the host exposes
    # (the test conftest runs 8 virtual CPU devices; the race is serial)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    trainer = Trainer(cfg, mesh=mesh,
                      workdir=tempfile.mkdtemp(prefix="parity_ours_"))
    b0 = epochs[0][0]
    state = trainer.init_state(b0["image"][:1], b0["modality"][:1])
    mapped = reference_to_flax(args.model,
                               {k: np.asarray(v) for k, v in torch_state.items()})
    params = partial_load(state.params, mapped, verbose=False)
    # every torch leaf must land (identical-architecture guarantee)
    n_leaves = len(jax.tree.leaves(params))
    n_mapped = len(jax.tree.leaves(mapped))
    assert n_leaves == n_mapped, (n_leaves, n_mapped)
    state = trainer.init_state(b0["image"][:1], b0["modality"][:1],
                               params=params)

    # forward parity gate before any training: same weights + same input
    # must give the same logits (channel-last vs torch channel-first)
    logits = np.asarray(trainer.apply_fn(
        state.params, jnp.asarray(b0["image"]), jnp.asarray(b0["modality"])))
    diff = float(np.max(np.abs(np.moveaxis(logits, -1, 1) - ref_logits0)))
    assert diff < 2e-3, f"forward parity gate failed: max|Δlogits|={diff}"
    print(f"[gate] forward parity max|Δlogits| = {diff:.2e}", flush=True)
    history = []
    for epoch, batches in enumerate(epochs):
        lr = trainer.scheduler(epoch)
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, lr))
        losses = []
        for b in batches:
            state, loss = trainer.train_step(state, b)
            losses.append(loss)
        train_loss = float(np.mean([float(l) for l in losses]))
        if (epoch + 1) % args.eval_every == 0 or epoch + 1 == len(epochs):
            m = trainer.evaluate(val, state, epoch=epoch)
            history.append(dict(epoch=epoch, train_loss=train_loss,
                                val_loss=m["val/loss/avg"],
                                dice=m["val_total_dice/avg"]))
            print(f"[ours]      epoch {epoch}: train={train_loss:.4f} "
                  f"val={m['val/loss/avg']:.4f} "
                  f"dice={m['val_total_dice/avg']:.4f}", flush=True)
    return diff, history


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unet",
                   choices=["unet", "swin_unetr"])
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--eval-every", type=int, default=2)
    p.add_argument("--volumes", type=int, default=8)
    p.add_argument("--val-volumes", type=int, default=2)
    p.add_argument("--shape", type=int, default=32)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--feature-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--reg-weight", type=float, default=1e-5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noise-floor", action="store_true",
                   help="race the reference against a 1-ulp-perturbed twin "
                        "of ITSELF (no JAX arm): measures the recipe's "
                        "intrinsic chaotic delta_dice at this epoch budget")
    p.add_argument("--fix-ref-grads", action="store_true",
                   help="apply fix_reference_norm_grads to the reference "
                        "model (work around the torch InstanceNorm "
                        "strided-cotangent backward bug) before racing")
    p.add_argument("--noise-scale", type=float, default=0.0,
                   help="with --noise-floor: perturb EVERY weight by "
                        "relative N(0, scale) instead of one element by one "
                        "ulp (scale≈1.2e-7 = f32 eps mimics a second f32 "
                        "framework's per-tensor re-rounding)")
    p.add_argument("--out", default="PARITY_TRAIN.json")
    args = p.parse_args()
    if args.model == "swin_unetr" and args.feature_size % 12:
        args.feature_size = 12  # reference enforces fs % 12 == 0

    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    epochs, val = make_data(args)
    t0 = time.time()
    torch_state, ref_logits0, ref_hist = run_reference(args, epochs, val)
    t_ref = time.time() - t0
    if args.noise_floor:
        t0 = time.time()
        _, _, twin_hist = run_reference(args, epochs, val, perturb=True)
        t_twin = time.time() - t0
        delta = twin_hist[-1]["dice"] - ref_hist[-1]["dice"]
        name = {"unet": "C-UNet", "swin_unetr": "C-Swin-UNETR"}[args.model]
        kind = (f"every-weight relative N(0,{args.noise_scale:g})"
                if args.noise_scale else "single-element 1-ulp")
        record = dict(
            model=args.model, noise_floor=True,
            noise_scale=args.noise_scale,
            recipe=f"NOISE FLOOR: {name} reference engine vs a {kind}-"
                   "perturbed twin of itself — same recipe/data/seed; the "
                   "intrinsic chaotic dice spread at this epoch budget",
            epochs=args.epochs, volumes_per_modality=args.volumes,
            shape=args.shape, classes=args.classes, lr=args.lr,
            reference=ref_hist, perturbed_twin=twin_hist,
            final_dice_reference=ref_hist[-1]["dice"],
            final_dice_twin=twin_hist[-1]["dice"],
            delta_dice=delta,
            wall_reference_s=round(t_ref, 1), wall_twin_s=round(t_twin, 1))
        out = Path(args.out)
        prev = json.loads(out.read_text()) if out.exists() else []
        prev.append(record)
        out.write_text(json.dumps(prev, indent=1))
        print(json.dumps(dict(noise_floor=True,
                              final_dice_reference=record["final_dice_reference"],
                              final_dice_twin=record["final_dice_twin"],
                              delta_dice=delta)))
        return
    t0 = time.time()
    fwd_diff, our_hist = run_ours(args, epochs, val, torch_state, ref_logits0)
    t_ours = time.time() - t0

    delta = our_hist[-1]["dice"] - ref_hist[-1]["dice"]
    name = {"unet": "C-UNet", "swin_unetr": "C-Swin-UNETR"}[args.model]
    fixed = bool(getattr(args, "fix_ref_grads", False))
    record = dict(
        model=args.model, fix_ref_grads=fixed,
        recipe=f"{name} dice_focal+adamw+warmup_cosine, identical torch-init "
               "weights via ref_import, identical batch stream, f32"
               + (" [reference InstanceNorm strided-cotangent backward "
                  "bug FIXED via contiguous-grad hooks]" if fixed else ""),
        epochs=args.epochs, volumes_per_modality=args.volumes,
        shape=args.shape, classes=args.classes, lr=args.lr,
        reference=ref_hist, ours=our_hist,
        final_dice_reference=ref_hist[-1]["dice"],
        final_dice_ours=our_hist[-1]["dice"],
        delta_dice=delta, forward_gate_max_abs=fwd_diff,
        wall_reference_s=round(t_ref, 1), wall_ours_s=round(t_ours, 1))
    out = Path(args.out)
    prev = json.loads(out.read_text()) if out.exists() else []
    prev.append(record)
    out.write_text(json.dumps(prev, indent=1))
    print(json.dumps(dict(final_dice_reference=record["final_dice_reference"],
                          final_dice_ours=record["final_dice_ours"],
                          delta_dice=delta)))


if __name__ == "__main__":
    main()
