"""Evaluation metrics: Dice, symmetric surface distance, nan-aware
reductions, cross-batch buffers, per-modality aggregation.

Re-implements the MONAI-1.1.0 metric surface the reference evaluates with
(SURVEY §2.10): `DiceMetric` (ignore_empty → NaN for absent GT classes),
`SurfaceDistanceMetric` (symmetric euclidean, EDT-based, eval-only → CPU
numpy/scipy), `do_metric_reduction` MEAN / MEAN_BATCH, `Cumulative`
buffers, and the reference's per-modality reduction
(`log_metric_with_modality`, utils/trainer.py:258-288).

Dice runs in JAX (on-device, feeds straight off the sliding-window
output); surface distance runs on CPU (scipy EDT) — it is eval-only and
bandwidth-trivial.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------- post ops

def as_discrete(x: Array, *, argmax: bool = False, to_onehot: int | None = None) -> Array:
    """MONAI `AsDiscrete` equivalent on channel-last tensors."""
    if argmax:
        x = jnp.argmax(x, axis=-1)
    if to_onehot is not None:
        if x.ndim >= 2 and x.shape[-1] == 1:
            x = x[..., 0]
        x = jax.nn.one_hot(x.astype(jnp.int32), to_onehot, dtype=jnp.float32)
    return x


# ---------------------------------------------------------------- dice

def dice_score(pred_onehot: Array, target_onehot: Array, *,
               include_background: bool = True,
               ignore_empty: bool = True) -> Array:
    """Per-(sample, class) Dice of binarized masks → `[B, C]` (NaN-aware).

    NaN where the GT class is absent (MONAI ignore_empty=True); with
    ignore_empty=False, absent-everywhere classes score 1.0.
    """
    if not include_background:
        pred_onehot = pred_onehot[..., 1:]
        target_onehot = target_onehot[..., 1:]
    axes = tuple(range(1, pred_onehot.ndim - 1))
    p = pred_onehot.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    intersection = jnp.sum(p * t, axis=axes)
    t_o = jnp.sum(t, axis=axes)
    p_o = jnp.sum(p, axis=axes)
    denom = t_o + p_o
    dice = 2.0 * intersection / jnp.maximum(denom, 1e-38)
    if ignore_empty:
        return jnp.where(t_o > 0, dice, jnp.nan)
    return jnp.where(denom > 0, dice, 1.0)


def dice_score_labels(pred_labels: Array, target_labels: Array,
                      num_classes: int, *, include_background: bool = True,
                      ignore_empty: bool = True) -> Array:
    """`dice_score` directly from integer label maps → `[B, C]`.

    Identical to `dice_score(one_hot(pred), one_hot(target))` but never
    materializes the `[B, *spatial, C]` f32 one-hots: with C=6 those are
    lane-padded 6 → 128 on TPU (a 224³ one-hot is 270 MB logical but
    5.7 GB physical, ×2 tensors).  The class axis is a STATIC host loop
    (C is tiny): each class costs one fused compare+reduce pass over the
    two integer maps in their natural layout — no transposed/flat-minor
    relayout, which measured as a TPU compile pathology on the loss side
    (BASELINE.md round-4 layout experiment).  Used by the jitted
    eval-metrics program (train/engine.py).
    """
    start = 0 if include_background else 1
    b = pred_labels.shape[0]
    axes = tuple(range(1, pred_labels.ndim))
    p = pred_labels.astype(jnp.int32)
    t = target_labels.astype(jnp.int32)
    inter_c, t_c, p_c = [], [], []
    for c in range(start, num_classes):
        pe = p == c
        te = t == c
        inter_c.append(jnp.sum(pe & te, axis=axes, dtype=jnp.float32))
        t_c.append(jnp.sum(te, axis=axes, dtype=jnp.float32))
        p_c.append(jnp.sum(pe, axis=axes, dtype=jnp.float32))
    intersection = jnp.stack(inter_c, axis=-1)  # [B, C]
    t_o = jnp.stack(t_c, axis=-1)
    p_o = jnp.stack(p_c, axis=-1)
    denom = t_o + p_o
    dice = 2.0 * intersection / jnp.maximum(denom, 1e-38)
    if ignore_empty:
        return jnp.where(t_o > 0, dice, jnp.nan)
    return jnp.where(denom > 0, dice, 1.0)


def generalized_dice_score(pred_onehot: Array, target_onehot: Array, *,
                           include_background: bool = True,
                           weight_type: str = "square") -> Array:
    """Per-sample generalized Dice score → `[B]` (MONAI GeneralizedDiceScore).

    w_c = 1/(Σt_c)^2 ("square"), 1/Σt_c ("simple"), or 1 ("uniform");
    empty-class weights get the row max.
    """
    if not include_background:
        pred_onehot = pred_onehot[..., 1:]
        target_onehot = target_onehot[..., 1:]
    axes = tuple(range(1, pred_onehot.ndim - 1))
    p = pred_onehot.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    intersection = jnp.sum(p * t, axis=axes)
    denom = jnp.sum(p, axis=axes) + jnp.sum(t, axis=axes)
    ground_o = jnp.sum(t, axis=axes)
    if weight_type == "square":
        w = 1.0 / jnp.square(jnp.maximum(ground_o, 1e-38))
    elif weight_type == "simple":
        w = 1.0 / jnp.maximum(ground_o, 1e-38)
    else:
        w = jnp.ones_like(ground_o)
    finite = ground_o > 0
    row_max = jnp.max(jnp.where(finite, w, -jnp.inf), axis=-1, keepdims=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    w = jnp.where(finite, w, row_max)
    numer = 2.0 * jnp.sum(intersection * w, axis=-1)
    den = jnp.sum(denom * w, axis=-1)
    return jnp.where(den > 0, numer / den, 1.0)


class LossMetric:
    """Streaming scalar-loss accumulator (MONAI LossMetric analog)."""

    def __init__(self, loss_fn):
        self.loss_fn = loss_fn
        self._vals: list[float] = []

    def __call__(self, logits, labels) -> float:
        v = float(self.loss_fn(logits, labels))
        self._vals.append(v)
        return v

    def aggregate(self, reduction: str = "mean") -> float:
        if not self._vals:
            return float("nan")
        if reduction == "mean":
            return float(np.mean(self._vals))
        if reduction == "sum":
            return float(np.sum(self._vals))
        raise ValueError(f"unknown reduction {reduction!r}")

    def reset(self) -> None:
        self._vals = []


# ------------------------------------------------------------- reductions

def reduce_mean_batch(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """MONAI MEAN_BATCH: nan-aware per-class batch mean → (`[C]`, not_nans `[C]`)."""
    vals = np.asarray(vals, dtype=np.float64)
    nans = np.isnan(vals)
    not_nans = (~nans).sum(axis=0).astype(np.float64)
    summed = np.where(nans, 0.0, vals).sum(axis=0)
    out = np.where(not_nans > 0, summed / np.maximum(not_nans, 1), 0.0)
    return out, not_nans


def reduce_mean(vals: np.ndarray) -> tuple[float, float]:
    """MONAI MEAN: channel nanmean per sample, then batch mean → (scalar, n)."""
    vals = np.asarray(vals, dtype=np.float64)
    nans = np.isnan(vals)
    not_nans = (~nans).sum(axis=1).astype(np.float64)          # per sample
    per_sample = np.where(not_nans > 0,
                          np.where(nans, 0.0, vals).sum(axis=1) / np.maximum(not_nans, 1),
                          0.0)
    n_valid = float((not_nans > 0).sum())
    mean = float(per_sample.sum() / max(n_valid, 1.0)) if n_valid else 0.0
    return mean, n_valid


def nanmean_valid(per_class: np.ndarray, not_nans: np.ndarray) -> float:
    """Mean over classes that had at least one valid sample
    (`torch.nanmean(acc[not_nans > 0])`, utils/trainer.py:251)."""
    mask = np.asarray(not_nans) > 0
    if not mask.any():
        return float("nan")
    return float(np.nanmean(np.asarray(per_class)[mask]))


# -------------------------------------------------------------- Cumulative

class Cumulative:
    """Cross-batch metric buffer (MONAI `Cumulative` with extend/get_buffer)."""

    def __init__(self):
        self._buffers: list[list[np.ndarray]] = []

    def extend(self, *rows) -> None:
        if not self._buffers:
            self._buffers = [[] for _ in rows]
        for buf, r in zip(self._buffers, rows):
            buf.append(np.asarray(r))

    def get_buffer(self):
        out = tuple(np.concatenate(b, axis=0) for b in self._buffers)
        return out if len(out) > 1 else out[0]

    def reset(self) -> None:
        self._buffers = []


class MetricAccumulator:
    """Streaming metric: accumulate `[B, C]` rows, aggregate nan-aware.

    Stands in for MONAI's stateful `DiceMetric`/`SurfaceDistanceMetric`
    aggregate()/reset() cycle.
    """

    def __init__(self, include_background: bool = True):
        self.include_background = include_background
        self._rows: list[np.ndarray] = []

    def __call__(self, rows) -> np.ndarray:
        rows = np.asarray(rows)
        self._rows.append(rows)
        return rows

    def aggregate(self, reduction: str = "mean_batch"):
        vals = np.concatenate(self._rows, axis=0)
        if reduction == "mean_batch":
            return reduce_mean_batch(vals)
        if reduction == "mean":
            return reduce_mean(vals)
        raise ValueError(f"unknown reduction {reduction!r}")

    def reset(self) -> None:
        self._rows = []


# ------------------------------------------------- per-modality aggregation

def metric_by_modality(vals: np.ndarray, modalities: np.ndarray,
                       label: str = "dice", class_offset: int = 0,
                       ns: str = "val") -> dict[str, float]:
    """Per-modality nan-aware per-class means + averages.

    Mirrors `log_metric_with_modality` (utils/trainer.py:258-288): for each
    modality m, batch-average valid entries per class, then average classes
    that had any valid sample.  Returns the reference's metric namespace:
    `val_modality{m}_{label}/class{c}` and `..._{label}/avg` (`ns` swaps
    the `val` prefix so test runs don't overwrite validation history).
    """
    vals = np.asarray(vals, dtype=np.float64)
    modalities = np.asarray(modalities).reshape(-1)
    out: dict[str, float] = {}
    for m in np.unique(modalities):
        v = vals[modalities == m]
        per_class, not_nans = reduce_mean_batch(v)
        for c, x in enumerate(per_class.tolist()):
            out[f"{ns}_modality{int(m)}_{label}/class{c + class_offset}"] = x
        out[f"{ns}_modality{int(m)}_{label}/avg"] = nanmean_valid(per_class,
                                                                  not_nans)
    return out


# ------------------------------------------------------- surface distance

def _mask_edges(mask: np.ndarray) -> np.ndarray:
    """Surface voxels: mask XOR erosion(mask)."""
    from . import native
    if not mask.any():
        return np.zeros_like(mask, dtype=bool)
    return mask ^ native.binary_erosion(mask)


def _surface_distances(src_edges: np.ndarray, dst_edges: np.ndarray) -> np.ndarray:
    """Euclidean distance of each src surface voxel to the dst surface."""
    from . import native
    if not dst_edges.any():
        return np.full(int(src_edges.sum()), np.inf)
    dist = native.edt(dst_edges)
    return np.asarray(dist[src_edges], dtype=np.float64)


def surface_distance(pred_onehot: np.ndarray, target_onehot: np.ndarray, *,
                     include_background: bool = True,
                     symmetric: bool = True) -> np.ndarray:
    """Average (symmetric) surface distance per (sample, class) → `[B, C]`.

    NaN where either mask has no surface (MONAI compute_average_surface_
    distance conventions; eval protocol at test.py:145-151).
    """
    pred = np.asarray(pred_onehot).astype(bool)
    target = np.asarray(target_onehot).astype(bool)
    if not include_background:
        pred, target = pred[..., 1:], target[..., 1:]
    b, c = pred.shape[0], pred.shape[-1]
    out = np.full((b, c), np.nan)
    for i in range(b):
        for j in range(c):
            ep = _mask_edges(pred[i, ..., j])
            eg = _mask_edges(target[i, ..., j])
            d = _surface_distances(ep, eg)
            if symmetric:
                d = np.concatenate([d, _surface_distances(eg, ep)])
            out[i, j] = d.mean() if d.size else np.nan
    return out
