"""Torch-side MONAI-1.1 TRAINING surface, for executing the reference's
own train/val loops in-environment.

`install_monai_stub` (monai_stub.py) covers the network-building surface
so the reference's `networks/` model code runs; this module adds the
training-time modules its raw engine needs — `utils/trainer.py:1-7`
imports `torch.cuda.amp.autocast`, `monai.data.decollate_batch`,
`monai.metrics.{LossMetric, Cumulative}`; `utils/training_utils.py:1-3`
imports `monai.losses.{DiceCELoss, DiceFocalLoss,
GeneralizedDiceFocalLoss}` and
`monai.optimizers.lr_scheduler.WarmupCosineSchedule`; `tune.py:111-137`
builds `DiceMetric` / `SurfaceDistanceMetric` / `GeneralizedDiceScore` /
`AsDiscrete`.

These are independent torch re-implementations of the MONAI-1.1.0
semantics (channel-FIRST, like torch) — the same semantics this repo
already implements channel-last in JAX (losses.py, metrics.py), so the
two sides cross-check each other: tests/test_losses.py pins the JAX side
to torch math, and the convergence-parity harness
(scripts/parity_train.py) runs the reference's loop against ours on
byte-identical data.  Nothing here is transcribed from MONAI or from
/root/reference.
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np


# --------------------------------------------------------------- helpers

def _build(torch):
    F = torch.nn.functional

    def _one_hot_cf(labels, num_classes):
        """[B, 1, *sp] integer → channel-first one-hot [B, C, *sp]."""
        if labels.shape[1] == 1:
            labels = labels[:, 0]
        oh = F.one_hot(labels.long(), num_classes).float()
        return oh.movedim(-1, 1)

    def _reduce_dims(x):
        return tuple(range(2, x.dim()))

    # ------------------------------------------------------------ losses

    class DiceLoss(torch.nn.Module):
        def __init__(self, include_background=True, to_onehot_y=False,
                     softmax=False, squared_pred=False, smooth_nr=1e-5,
                     smooth_dr=1e-5, **_):
            super().__init__()
            self.include_background = include_background
            self.to_onehot_y = to_onehot_y
            self.softmax = softmax
            self.squared_pred = squared_pred
            self.smooth_nr = float(smooth_nr)
            self.smooth_dr = float(smooth_dr)

        def forward(self, input, target):
            n_ch = input.shape[1]
            p = torch.softmax(input.float(), dim=1) if self.softmax \
                else input.float()
            t = _one_hot_cf(target, n_ch) if self.to_onehot_y \
                else target.float()
            if not self.include_background:
                p, t = p[:, 1:], t[:, 1:]
            dims = _reduce_dims(p)
            inter = (p * t).sum(dims)
            if self.squared_pred:
                denom = (p * p).sum(dims) + (t * t).sum(dims)
            else:
                denom = p.sum(dims) + t.sum(dims)
            f = 1.0 - (2.0 * inter + self.smooth_nr) / (denom + self.smooth_dr)
            return f.mean()

    class FocalLoss(torch.nn.Module):
        """BCE-with-logits focal on raw per-class logits (MONAI 1.1.0)."""

        def __init__(self, include_background=True, to_onehot_y=False,
                     gamma=2.0, **_):
            super().__init__()
            self.include_background = include_background
            self.to_onehot_y = to_onehot_y
            self.gamma = float(gamma)

        def forward(self, input, target):
            n_ch = input.shape[1]
            x = input.float()
            t = _one_hot_cf(target, n_ch) if self.to_onehot_y \
                else target.float()
            if not self.include_background:
                x, t = x[:, 1:], t[:, 1:]
            ce = F.binary_cross_entropy_with_logits(x, t, reduction="none")
            p = torch.exp(-ce)
            return ((1.0 - p) ** self.gamma * ce).mean()

    class GeneralizedDiceLoss(torch.nn.Module):
        def __init__(self, include_background=True, to_onehot_y=False,
                     softmax=False, smooth_nr=1e-5, smooth_dr=1e-5, **_):
            super().__init__()
            self.include_background = include_background
            self.to_onehot_y = to_onehot_y
            self.softmax = softmax
            self.smooth_nr = float(smooth_nr)
            self.smooth_dr = float(smooth_dr)

        def forward(self, input, target):
            n_ch = input.shape[1]
            p = torch.softmax(input.float(), dim=1) if self.softmax \
                else input.float()
            t = _one_hot_cf(target, n_ch) if self.to_onehot_y \
                else target.float()
            if not self.include_background:
                p, t = p[:, 1:], t[:, 1:]
            dims = _reduce_dims(p)
            inter = (p * t).sum(dims)                    # [B, C]
            denom = p.sum(dims) + t.sum(dims)
            ground_o = t.sum(dims)
            w = 1.0 / (ground_o.clamp(min=0.0) + 1e-38) ** 2
            finite = ground_o > 0
            row_max = torch.where(finite, w,
                                  torch.full_like(w, -math.inf)) \
                .max(dim=-1, keepdim=True).values
            row_max = torch.where(torch.isfinite(row_max), row_max,
                                  torch.zeros_like(row_max))
            w = torch.where(finite, w, row_max.expand_as(w))
            numer = 2.0 * (inter * w).sum(-1) + self.smooth_nr
            den = (denom * w).sum(-1) + self.smooth_dr
            return (1.0 - numer / den).mean()

    class DiceFocalLoss(torch.nn.Module):
        def __init__(self, include_background=True, to_onehot_y=False,
                     softmax=False, squared_pred=False, smooth_nr=1e-5,
                     smooth_dr=1e-5, gamma=2.0, lambda_dice=1.0,
                     lambda_focal=1.0, **_):
            super().__init__()
            self.dice = DiceLoss(include_background=include_background,
                                 to_onehot_y=to_onehot_y, softmax=softmax,
                                 squared_pred=squared_pred,
                                 smooth_nr=smooth_nr, smooth_dr=smooth_dr)
            self.focal = FocalLoss(include_background=include_background,
                                   to_onehot_y=to_onehot_y, gamma=gamma)
            self.lambda_dice = lambda_dice
            self.lambda_focal = lambda_focal

        def forward(self, input, target):
            return (self.lambda_dice * self.dice(input, target)
                    + self.lambda_focal * self.focal(input, target))

    class DiceCELoss(torch.nn.Module):
        def __init__(self, include_background=True, to_onehot_y=False,
                     softmax=False, squared_pred=False, smooth_nr=1e-5,
                     smooth_dr=1e-5, lambda_dice=1.0, lambda_ce=1.0, **_):
            super().__init__()
            self.dice = DiceLoss(include_background=include_background,
                                 to_onehot_y=to_onehot_y, softmax=softmax,
                                 squared_pred=squared_pred,
                                 smooth_nr=smooth_nr, smooth_dr=smooth_dr)
            self.lambda_dice = lambda_dice
            self.lambda_ce = lambda_ce

        def forward(self, input, target):
            tgt = target[:, 0] if target.shape[1] == 1 else target
            ce = F.cross_entropy(input.float(), tgt.long())
            return self.lambda_dice * self.dice(input, target) \
                + self.lambda_ce * ce

    class GeneralizedDiceFocalLoss(torch.nn.Module):
        def __init__(self, include_background=True, to_onehot_y=False,
                     softmax=False, smooth_nr=1e-5, smooth_dr=1e-5,
                     gamma=2.0, lambda_gdl=1.0, lambda_focal=1.0, **_):
            super().__init__()
            self.gdl = GeneralizedDiceLoss(
                include_background=include_background,
                to_onehot_y=to_onehot_y, softmax=softmax,
                smooth_nr=smooth_nr, smooth_dr=smooth_dr)
            self.focal = FocalLoss(include_background=include_background,
                                   to_onehot_y=to_onehot_y, gamma=gamma)
            self.lambda_gdl = lambda_gdl
            self.lambda_focal = lambda_focal

        def forward(self, input, target):
            return (self.lambda_gdl * self.gdl(input, target)
                    + self.lambda_focal * self.focal(input, target))

    # --------------------------------------------------------- scheduler

    class WarmupCosineSchedule(torch.optim.lr_scheduler.LambdaLR):
        """Linear warmup → cosine decay (mirrors train/schedules.py, which
        is parity-tested against the published curve)."""

        def __init__(self, optimizer, warmup_steps, t_total, cycles=0.5,
                     last_epoch=-1):
            self.warmup_steps = warmup_steps
            self.t_total = t_total
            self.cycles = cycles
            super().__init__(optimizer, self._lambda, last_epoch)

        def _lambda(self, step):
            if step < self.warmup_steps:
                return float(step) / max(1.0, self.warmup_steps)
            progress = float(step - self.warmup_steps) / max(
                1.0, self.t_total - self.warmup_steps)
            return max(0.0, 0.5 * (1.0 + math.cos(
                math.pi * 2.0 * self.cycles * progress)))

    # ----------------------------------------------------------- metrics

    def _dice_rows(y_pred, y, include_background, ignore_empty=True):
        if not include_background:
            y_pred, y = y_pred[:, 1:], y[:, 1:]
        dims = _reduce_dims(y_pred)
        p = y_pred.float()
        t = y.float()
        inter = (p * t).sum(dims)
        t_o = t.sum(dims)
        p_o = p.sum(dims)
        denom = t_o + p_o
        dice = 2.0 * inter / denom.clamp(min=1e-38)
        nan = torch.full_like(dice, math.nan)
        if ignore_empty:
            return torch.where(t_o > 0, dice, nan)
        return torch.where(denom > 0, dice, torch.ones_like(dice))

    def _mean_batch(rows):
        nans = torch.isnan(rows)
        not_nans = (~nans).float().sum(dim=0)
        summed = torch.where(nans, torch.zeros_like(rows), rows).sum(dim=0)
        out = torch.where(not_nans > 0, summed / not_nans.clamp(min=1),
                          torch.zeros_like(summed))
        return out, not_nans

    class _CumulativeBase:
        def __init__(self):
            self._buffers: list[list] = []

        def extend(self, *rows):
            if not self._buffers:
                self._buffers = [[] for _ in rows]
            for buf, r in zip(self._buffers, rows):
                buf.append(torch.as_tensor(np.asarray(
                    r.detach().cpu() if hasattr(r, "detach") else r)))

        def get_buffer(self):
            out = tuple(torch.cat(b, dim=0) for b in self._buffers)
            return out if len(out) > 1 else out[0]

        def reset(self):
            self._buffers = []

    class Cumulative(_CumulativeBase):
        pass

    class LossMetric:
        def __init__(self, loss_fn):
            self.loss_fn = loss_fn
            self._vals: list[float] = []

        def __call__(self, y_pred, y):
            v = float(self.loss_fn(y_pred, y).detach())
            self._vals.append(v)
            return v

        def aggregate(self, reduction="mean"):
            if not self._vals:
                return torch.tensor(math.nan)
            vals = torch.tensor(self._vals)
            return vals.mean() if reduction == "mean" else vals.sum()

        def reset(self):
            self._vals = []

    class DiceMetric:
        def __init__(self, include_background=True, reduction="mean_batch",
                     get_not_nans=False, ignore_empty=True, **_):
            self.include_background = include_background
            self.reduction = reduction
            self.get_not_nans = get_not_nans
            self.ignore_empty = ignore_empty
            self._rows: list = []

        def __call__(self, y_pred, y):
            rows = _dice_rows(y_pred, y, self.include_background,
                              self.ignore_empty)
            self._rows.append(rows)
            return rows

        def aggregate(self):
            rows = torch.cat(self._rows, dim=0)
            if self.reduction != "mean_batch":
                raise NotImplementedError(self.reduction)
            out, not_nans = _mean_batch(rows)
            return (out, not_nans) if self.get_not_nans else out

        def reset(self):
            self._rows = []

    class SurfaceDistanceMetric:
        """Symmetric euclidean average surface distance, per (sample,
        class) — delegates to this repo's native-EDT implementation
        (metrics.surface_distance), transposed to channel-first."""

        def __init__(self, include_background=True, symmetric=True,
                     distance_metric="euclidean", reduction="mean_batch",
                     get_not_nans=False, **_):
            if distance_metric != "euclidean":
                raise NotImplementedError(distance_metric)
            self.include_background = include_background
            self.symmetric = symmetric
            self.reduction = reduction
            self.get_not_nans = get_not_nans
            self._rows: list = []

        def __call__(self, y_pred, y):
            from ..metrics import surface_distance
            p = np.moveaxis(np.asarray(y_pred.detach().cpu()), 1, -1)
            t = np.moveaxis(np.asarray(y.detach().cpu()), 1, -1)
            rows = torch.as_tensor(surface_distance(
                p, t, include_background=self.include_background,
                symmetric=self.symmetric))
            self._rows.append(rows)
            return rows

        def aggregate(self):
            rows = torch.cat(self._rows, dim=0)
            out, not_nans = _mean_batch(rows)
            return (out, not_nans) if self.get_not_nans else out

        def reset(self):
            self._rows = []

    class GeneralizedDiceScore:
        def __init__(self, include_background=True, weight_type="square", **_):
            self.include_background = include_background
            self.weight_type = weight_type
            self._rows: list = []

        def __call__(self, y_pred, y):
            from ..metrics import generalized_dice_score
            import jax.numpy as jnp
            p = np.moveaxis(np.asarray(y_pred.detach().cpu()), 1, -1)
            t = np.moveaxis(np.asarray(y.detach().cpu()), 1, -1)
            rows = torch.as_tensor(np.asarray(generalized_dice_score(
                jnp.asarray(p), jnp.asarray(t),
                include_background=self.include_background,
                weight_type=self.weight_type)))
            self._rows.append(rows)
            return rows

        def aggregate(self):
            return torch.cat(self._rows, dim=0).mean()

        def reset(self):
            self._rows = []

    # ------------------------------------------------- data / transforms

    def decollate_batch(batch):
        if isinstance(batch, dict):
            keys = list(batch)
            n = len(batch[keys[0]])
            return [{k: batch[k][i] for k in keys} for i in range(n)]
        return list(torch.unbind(torch.as_tensor(batch), dim=0))

    class AsDiscrete:
        """Channel-first single-sample post op ([C, *spatial])."""

        def __init__(self, argmax=False, to_onehot=None, **_):
            self.argmax = argmax
            self.to_onehot = to_onehot

        def __call__(self, img):
            img = torch.as_tensor(img)
            if self.argmax:
                img = img.argmax(dim=0, keepdim=True)
            if self.to_onehot is not None:
                if img.shape[0] == 1:
                    img = img[0]
                img = F.one_hot(img.long(),
                                self.to_onehot).float().movedim(-1, 0)
            return img

    return dict(
        DiceLoss=DiceLoss, FocalLoss=FocalLoss,
        GeneralizedDiceLoss=GeneralizedDiceLoss,
        DiceFocalLoss=DiceFocalLoss, DiceCELoss=DiceCELoss,
        GeneralizedDiceFocalLoss=GeneralizedDiceFocalLoss,
        WarmupCosineSchedule=WarmupCosineSchedule,
        LossMetric=LossMetric, Cumulative=Cumulative,
        DiceMetric=DiceMetric, SurfaceDistanceMetric=SurfaceDistanceMetric,
        GeneralizedDiceScore=GeneralizedDiceScore,
        decollate_batch=decollate_batch, AsDiscrete=AsDiscrete,
    )


def install_monai_train_stub() -> dict:
    """Register monai.losses/metrics/data/transforms/optimizers stubs.

    Requires (and triggers) `install_monai_stub` so `monai` exists as a
    module first.  Idempotent.
    """
    from .monai_stub import install_monai_stub
    install_monai_stub()
    if "monai.losses" in sys.modules:
        return {}
    import torch
    api = _build(torch)
    monai = sys.modules["monai"]

    losses = types.ModuleType("monai.losses")
    for name in ("DiceLoss", "FocalLoss", "GeneralizedDiceLoss",
                 "DiceFocalLoss", "DiceCELoss", "GeneralizedDiceFocalLoss"):
        setattr(losses, name, api[name])
    metrics = types.ModuleType("monai.metrics")
    for name in ("LossMetric", "Cumulative", "DiceMetric",
                 "SurfaceDistanceMetric", "GeneralizedDiceScore"):
        setattr(metrics, name, api[name])
    data = types.ModuleType("monai.data")
    data.decollate_batch = api["decollate_batch"]
    transforms = types.ModuleType("monai.transforms")
    transforms.AsDiscrete = api["AsDiscrete"]
    optimizers = types.ModuleType("monai.optimizers")
    lr_sched = types.ModuleType("monai.optimizers.lr_scheduler")
    lr_sched.WarmupCosineSchedule = api["WarmupCosineSchedule"]
    optimizers.lr_scheduler = lr_sched

    mods = {"monai.losses": losses, "monai.metrics": metrics,
            "monai.data": data, "monai.transforms": transforms,
            "monai.optimizers": optimizers,
            "monai.optimizers.lr_scheduler": lr_sched}
    sys.modules.update(mods)
    monai.losses = losses
    monai.metrics = metrics
    monai.data = data
    monai.transforms = transforms
    monai.optimizers = optimizers
    return mods
