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
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def _one_hot(labels: Array, num_classes: int) -> Array:
    if labels.ndim >= 2 and labels.shape[-1] == 1:
        labels = labels[..., 0]
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)


def _spatial_axes(x: Array) -> tuple[int, ...]:
    return tuple(range(1, x.ndim - 1))


def dice_loss(logits: Array, labels: Array, *, include_background: bool = True,
              squared_pred: bool = True, smooth_nr: float = 0.0,
              smooth_dr: float = 1e-6, softmax: bool = True) -> Array:
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) if softmax \
        else logits.astype(jnp.float32)
    target = _one_hot(labels, logits.shape[-1])
    if not include_background:
        probs, target = probs[..., 1:], target[..., 1:]
    axes = _spatial_axes(probs)
    intersection = jnp.sum(probs * target, axis=axes)
    if squared_pred:
        denom = jnp.sum(jnp.square(probs), axis=axes) + jnp.sum(jnp.square(target), axis=axes)
    else:
        denom = jnp.sum(probs, axis=axes) + jnp.sum(target, axis=axes)
    f = 1.0 - (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(f)


def focal_loss(logits: Array, labels: Array, *, include_background: bool = True,
               gamma: float = 2.0) -> Array:
    """BCE-with-logits focal on raw per-class logits (MONAI 1.1.0 semantics)."""
    target = _one_hot(labels, logits.shape[-1])
    x = logits.astype(jnp.float32)
    if not include_background:
        x, target = x[..., 1:], target[..., 1:]
    # numerically-stable BCE with logits
    max_val = jnp.maximum(-x, 0.0)
    ce = x - x * target + max_val + jnp.log(jnp.exp(-max_val) + jnp.exp(-x - max_val))
    p = jnp.exp(-ce)
    return jnp.mean(jnp.power(1.0 - p, gamma) * ce)


def cross_entropy_loss(logits: Array, labels: Array) -> Array:
    """Softmax cross-entropy on integer labels (torch CrossEntropyLoss mean)."""
    if labels.ndim >= 2 and labels.shape[-1] == 1:
        labels = labels[..., 0]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels.astype(jnp.int32)[..., None], axis=-1)
    return jnp.mean(nll)


def generalized_dice_loss(logits: Array, labels: Array, *,
                          include_background: bool = True,
                          smooth_nr: float = 0.0, smooth_dr: float = 1e-6,
                          softmax: bool = True) -> Array:
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) if softmax \
        else logits.astype(jnp.float32)
    target = _one_hot(labels, logits.shape[-1])
    if not include_background:
        probs, target = probs[..., 1:], target[..., 1:]
    axes = _spatial_axes(probs)
    intersection = jnp.sum(probs * target, axis=axes)      # [B, C]
    denominator = jnp.sum(probs, axis=axes) + jnp.sum(target, axis=axes)
    ground_o = jnp.sum(target, axis=axes)
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
