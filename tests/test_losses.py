"""Losses vs independent torch reference computations (cpu torch is in-image)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from miseg_tpu import losses


@pytest.fixture
def case(rng):
    logits = rng.standard_normal((2, 6, 6, 6, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 6, 6, 6))
    return logits, labels


def torch_dice(logits, labels, squared=True, smooth_nr=0.0, smooth_dr=1e-6):
    p = torch.softmax(torch.from_numpy(logits), dim=-1)
    t = F.one_hot(torch.from_numpy(labels).long(), 4).float()
    dims = (1, 2, 3)
    inter = (p * t).sum(dims)
    if squared:
        denom = (p * p).sum(dims) + (t * t).sum(dims)
    else:
        denom = p.sum(dims) + t.sum(dims)
    return float((1 - (2 * inter + smooth_nr) / (denom + smooth_dr)).mean())


def test_dice_loss_matches_reference(case):
    logits, labels = case
    ours = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert ours == pytest.approx(torch_dice(logits, labels), rel=1e-5)


def test_dice_loss_not_squared(case):
    logits, labels = case
    ours = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  squared_pred=False))
    assert ours == pytest.approx(torch_dice(logits, labels, squared=False), rel=1e-5)


def test_focal_matches_bce_with_logits(case):
    """MONAI 1.1.0 focal = (1-p)^gamma * BCE-with-logits on raw logits."""
    logits, labels = case
    x = torch.from_numpy(logits)
    t = F.one_hot(torch.from_numpy(labels).long(), 4).float()
    ce = F.binary_cross_entropy_with_logits(x, t, reduction="none")
    p = torch.exp(-ce)
    want = float(((1 - p) ** 2.0 * ce).mean())
    ours = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert ours == pytest.approx(want, rel=1e-5)


def test_cross_entropy_matches_torch(case):
    logits, labels = case
    want = float(F.cross_entropy(
        torch.from_numpy(logits).permute(0, 4, 1, 2, 3),
        torch.from_numpy(labels).long()))
    ours = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert ours == pytest.approx(want, rel=1e-5)


def test_generalized_dice_weights(rng):
    """Perfect prediction → ~0 loss; absent classes get row-max weight."""
    labels = rng.integers(0, 3, (1, 8, 8, 8))
    onehot = np.eye(4, dtype=np.float32)[labels]  # class 3 never appears
    logits = np.log(onehot * 0.999 + 1e-6)
    val = float(losses.generalized_dice_loss(jnp.asarray(logits),
                                             jnp.asarray(labels)))
    assert val < 0.01


def test_loss_from_config_dispatch():
    from miseg_tpu.config import Config
    for crit in ("dice_focal", "dice_ce", "generalized_dice_focal"):
        fn = losses.loss_from_config(Config(criterion=crit))
        v = fn(jnp.zeros((1, 4, 4, 4, 2)), jnp.zeros((1, 4, 4, 4), jnp.int32))
        assert np.isfinite(float(v))
    with pytest.raises(ValueError):
        losses.loss_from_config(Config(criterion="nope"))


def test_channel_major_layout_matches_default(case, monkeypatch):
    """MISEG_CM_LOSS=1 (channel-major [B,C,V] working layout) is numerically
    equivalent to the default channel-last path — values AND gradients, with
    and without background (reduction order differs => tiny fp noise)."""
    import jax

    logits, labels = case
    lg, lb = jnp.asarray(logits), jnp.asarray(labels)
    fns = [
        lambda a, b: losses.dice_loss(a, b),
        lambda a, b: losses.dice_loss(a, b, include_background=False,
                                      squared_pred=False),
        lambda a, b: losses.focal_loss(a, b),
        lambda a, b: losses.focal_loss(a, b, include_background=False),
        lambda a, b: losses.cross_entropy_loss(a, b),
        lambda a, b: losses.generalized_dice_loss(a, b),
        lambda a, b: losses.generalized_dice_loss(a, b,
                                                  include_background=False),
        lambda a, b: losses.dice_focal_loss(a, b),
        lambda a, b: losses.generalized_dice_focal_loss(a, b),
    ]
    for fn in fns:
        monkeypatch.setenv("MISEG_CM_LOSS", "0")
        v0, g0 = jax.value_and_grad(fn)(lg, lb)
        monkeypatch.setenv("MISEG_CM_LOSS", "1")
        v1, g1 = jax.value_and_grad(fn)(lg, lb)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-4, atol=1e-7)
