"""Segmentation losses: Dice, DiceCE, DiceFocal, GeneralizedDiceFocal.

Re-implements the MONAI-1.1.0 loss surface the reference trains with
(utils/training_utils.py:6-36, networks/lightning_monai.py:47-67):

  * `dice_loss` — softmax → one-hot target; per-(batch, class) reduction
    over spatial dims; `squared_pred` squares both terms in the
    denominator; `smooth_nr`/`smooth_dr` added to numerator/denominator;
    mean reduction.
  * `focal_loss` — MONAI's focal is BCE-with-logits based, applied to the
    RAW per-class logits (not the softmax), modulated by `(1-p)^gamma`,
    gamma=2.0 default.
  * `dice_ce_loss` — dice + softmax cross-entropy on integer targets.
  * `generalized_dice_loss` — per-class weights w = 1/(Σt)², inf→row max,
    per-sample reduction over classes.

All functions take channel-last logits `[B, *spatial, C]` and integer
labels `[B, *spatial]` (or `[B, *spatial, 1]`), compute in float32, and
are jit/grad-safe (pure, static shapes).

TPU traffic design (round 4): the flagship train step moves ~2 GB of
avoidable loss-graph bytes per 96³ patch when written the obvious way —
a materialized f32 one-hot `[B, V, C]` feeding several fusions
(`broadcast_select` 981 MB) and the stable-BCE `max(-x, 0)` chain whose
forward+backward selects dominate (`pad_maximum` 736 MB ×2); see
BASELINE.md round-3 train accounting.  These rewrites are numerically
identical but give XLA a one-pass graph:

  * the one-hot target is NEVER materialized — every reduction recomputes
    the boolean `label == class` broadcast inline (labels are a 4-byte
    `[B, V]` read; the compare lives in registers), and `Σ target² =
    Σ target = per-class voxel count` because a one-hot is idempotent;
  * focal's stable BCE collapses via the signed logit `s = (2t−1)·x`
    (t ∈ {0,1} ⇒ `s = where(label==c, x, −x)`): `ce = softplus(−s)`,
    `p = sigmoid(s)` — the same function as `max(x,0) − x·t +
    log1p(exp(−|x|))` with one select instead of a maximum/exp/log chain
    in forward AND backward;
  * cross-entropy gathers the label logit as a masked minor-axis reduce
    (fuses with logsumexp) instead of `take_along_axis`.

Round-4 accounting epilogue: those rewrites cut logical ops but NOT
physical bytes — with C=6 lane-padded 6→128, every `[B, V, C]` f32 pass
still moves ~453 MB of tiles (the new `where(eq, x, −x)` select shows up
as the same 981 MB fusion the one-hot select did).  The remaining lever
is LAYOUT, not op count: `MISEG_CM_LOSS=1` computes every loss
channel-major — `[B, C, V]`, where C pads 6→8 on sublanes (1.33×)
instead of 6→128 on lanes (21×) and the flattened V=96³ is lane-dense —
for ~16× less physical traffic per loss pass, at the price of one
boundary relayout each way (fwd transpose + grad transpose at the conv
output).  Numerically identical (same f32 math per element; reduction
order differs ⇒ ≤1 ulp-scale noise).  E2E verdict: BASELINE.md round-4
table.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def _use_channel_major() -> bool:
    env = os.environ.get("MISEG_CM_LOSS", "").strip().lower()
    if env:
        return env not in ("0", "false", "off")
    return False  # pending the e2e TPU verdict — see BASELINE.md round 4


def _int_labels(labels: Array) -> Array:
    """Accept [B, *spatial] or [B, *spatial, 1] integer labels."""
    if labels.ndim >= 2 and labels.shape[-1] == 1:
        labels = labels[..., 0]
    return labels.astype(jnp.int32)


def _label_eq(labels: Array, num_classes: int, *, start: int = 0) -> Array:
    """Boolean one-hot `[B, *spatial, C-start]`, left unfused for XLA.

    This is deliberately NOT converted to float here: each consumer
    reduction recomputes the compare from the tiny integer label tensor
    inside its own fusion, so no `[B, V, C]` f32 target ever hits HBM.
    """
    classes = jnp.arange(start, num_classes, dtype=jnp.int32)
    return _int_labels(labels)[..., None] == classes


def _spatial_axes(x: Array) -> tuple[int, ...]:
    return tuple(range(1, x.ndim - 1))


def _layout(logits: Array, labels: Array, start: int):
    """Loss working layout: `(x_f32, eq_bool, class_axis, spatial_axes,
    slice_c)`.

    Default: channel-last as given — `x = [B, *spatial, C]`, class axis −1.
    `MISEG_CM_LOSS=1`: channel-major — `x = [B, C, V]` with spatial dims
    flattened to a lane-dense minor axis (V = Π spatial ≫ 128) and C on
    sublanes.  Class-axis reductions (softmax / logsumexp / the label
    gather) become tiny sublane reduces; spatial reductions are
    full-bandwidth lane-axis reduces; elementwise passes stop paying the
    6→128 lane padding.  The transpose itself fuses with the f32 upcast
    at the conv-output boundary.

    `x` keeps ALL classes (softmax consumers slice AFTER normalizing, as
    MONAI does); `eq` covers classes `start..C`; `slice_c` drops the
    first `start` classes along the class axis of an x-layout tensor.
    """
    c = logits.shape[-1]
    lab = _int_labels(labels)
    classes = jnp.arange(start, c, dtype=jnp.int32)
    if _use_channel_major() and logits.ndim >= 3:
        b = logits.shape[0]
        x = jnp.moveaxis(logits, -1, 1).reshape(b, c, -1).astype(jnp.float32)
        eq = lab.reshape(b, 1, -1) == classes[:, None]
        return x, eq, 1, (2,), (lambda a: a[:, start:] if start else a)
    x = logits.astype(jnp.float32)
    eq = lab[..., None] == classes
    return (x, eq, -1, tuple(range(1, x.ndim - 1)),
            (lambda a: a[..., start:] if start else a))


def dice_loss(logits: Array, labels: Array, *, include_background: bool = True,
              squared_pred: bool = True, smooth_nr: float = 0.0,
              smooth_dr: float = 1e-6, softmax: bool = True) -> Array:
    start = 0 if include_background else 1
    x, eq, caxis, saxes, slice_c = _layout(logits, labels, start)
    probs = jax.nn.softmax(x, axis=caxis) if softmax else x
    probs = slice_c(probs)
    intersection = jnp.sum(jnp.where(eq, probs, 0.0), axis=saxes)   # [B, C]
    # one-hot ⇒ Σ t² = Σ t = per-class voxel count
    tsum = jnp.sum(eq, axis=saxes, dtype=jnp.float32)
    if squared_pred:
        denom = jnp.sum(jnp.square(probs), axis=saxes) + tsum
    else:
        denom = jnp.sum(probs, axis=saxes) + tsum
    f = 1.0 - (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(f)


def focal_loss(logits: Array, labels: Array, *, include_background: bool = True,
               gamma: float = 2.0) -> Array:
    """BCE-with-logits focal on raw per-class logits (MONAI 1.1.0 semantics).

    Signed-logit form: with t ∈ {0,1}, BCEWithLogits(x, t) =
    softplus(−(2t−1)·x) and p = exp(−ce) = sigmoid((2t−1)·x) — exactly the
    classic `max(x,0) − x·t + log1p(exp(−|x|))`, but one fused select.
    """
    start = 0 if include_background else 1
    x, eq, _, _, slice_c = _layout(logits, labels, start)
    s = jnp.where(eq, slice_c(x), -slice_c(x))
    ce = jax.nn.softplus(-s)
    p = jax.nn.sigmoid(s)
    return jnp.mean(jnp.power(1.0 - p, gamma) * ce)


def cross_entropy_loss(logits: Array, labels: Array) -> Array:
    """Softmax cross-entropy on integer labels (torch CrossEntropyLoss mean)."""
    x, eq, caxis, _, _ = _layout(logits, labels, 0)
    # label logit via masked class-axis reduce: fuses with the logsumexp
    # pass instead of a take_along_axis gather
    x_at_label = jnp.sum(jnp.where(eq, x, 0.0), axis=caxis)
    nll = jax.nn.logsumexp(x, axis=caxis) - x_at_label
    return jnp.mean(nll)


def generalized_dice_loss(logits: Array, labels: Array, *,
                          include_background: bool = True,
                          smooth_nr: float = 0.0, smooth_dr: float = 1e-6,
                          softmax: bool = True) -> Array:
    start = 0 if include_background else 1
    x, eq, caxis, saxes, slice_c = _layout(logits, labels, start)
    probs = jax.nn.softmax(x, axis=caxis) if softmax else x
    probs = slice_c(probs)
    intersection = jnp.sum(jnp.where(eq, probs, 0.0), axis=saxes)  # [B, C]
    ground_o = jnp.sum(eq, axis=saxes, dtype=jnp.float32)
    denominator = jnp.sum(probs, axis=saxes) + ground_o
    w = 1.0 / jnp.square(jnp.maximum(ground_o, 0.0) + 1e-38)
    # inf (empty class) → max finite weight in the same sample's row
    finite = ground_o > 0
    row_max = jnp.max(jnp.where(finite, w, -jnp.inf), axis=-1, keepdims=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    w = jnp.where(finite, w, row_max)
    numer = 2.0 * jnp.sum(intersection * w, axis=-1) + smooth_nr  # per sample
    denom = jnp.sum(denominator * w, axis=-1) + smooth_dr
    return jnp.mean(1.0 - numer / denom)


def dice_focal_loss(logits, labels, *, include_background=True, squared_pred=True,
                    smooth_nr=0.0, smooth_dr=1e-6, gamma=2.0,
                    lambda_dice=1.0, lambda_focal=1.0):
    return (lambda_dice * dice_loss(logits, labels,
                                    include_background=include_background,
                                    squared_pred=squared_pred,
                                    smooth_nr=smooth_nr, smooth_dr=smooth_dr)
            + lambda_focal * focal_loss(logits, labels,
                                        include_background=include_background,
                                        gamma=gamma))


def dice_ce_loss(logits, labels, *, include_background=True, squared_pred=False,
                 smooth_nr=0.0, smooth_dr=1e-6, lambda_dice=1.0, lambda_ce=1.0):
    return (lambda_dice * dice_loss(logits, labels,
                                    include_background=include_background,
                                    squared_pred=squared_pred,
                                    smooth_nr=smooth_nr, smooth_dr=smooth_dr)
            + lambda_ce * cross_entropy_loss(logits, labels))


def generalized_dice_focal_loss(logits, labels, *, include_background=True,
                                smooth_nr=0.0, smooth_dr=1e-6, gamma=2.0,
                                lambda_gdl=1.0, lambda_focal=1.0):
    return (lambda_gdl * generalized_dice_loss(logits, labels,
                                               include_background=include_background,
                                               smooth_nr=smooth_nr,
                                               smooth_dr=smooth_dr)
            + lambda_focal * focal_loss(logits, labels,
                                        include_background=include_background,
                                        gamma=gamma))


def loss_from_config(cfg) -> Callable[[Array, Array], Array]:
    """Config → loss callable (utils/training_utils.py:6-36 dispatch).

    Like the reference, background is ALWAYS included in the loss (the
    include_background flag is deliberately commented out there,
    training_utils.py:8-10).
    """
    name = cfg.criterion
    if name == "dice_focal":
        return lambda lg, lb: dice_focal_loss(lg, lb, squared_pred=True,
                                              smooth_nr=cfg.smooth_nr,
                                              smooth_dr=cfg.smooth_dr)
    if name == "dice_ce":
        return lambda lg, lb: dice_ce_loss(lg, lb, squared_pred=cfg.squared_dice,
                                           smooth_nr=cfg.smooth_nr,
                                           smooth_dr=cfg.smooth_dr)
    if name == "generalized_dice_focal":
        return lambda lg, lb: generalized_dice_focal_loss(lg, lb,
                                                          smooth_nr=cfg.smooth_nr,
                                                          smooth_dr=cfg.smooth_dr)
    raise ValueError(f"Criterion {name} not implemented, please chose another optimizer.")
